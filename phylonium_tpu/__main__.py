import os
import sys

from phylonium_tpu.cli import main

if __name__ == "__main__":
    rc = main()
    # Hard exit: background device threads (backend handshake, the
    # compare race's losing side, prewarm compiles) may still be inside
    # the TPU plugin; normal interpreter teardown aborts with
    # "terminate called ..." when it kills them mid-call.  All outputs
    # are written and flushed by main(); nothing below us needs atexit.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)
