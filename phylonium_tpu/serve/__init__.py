"""Device server: a long-lived warm tunnel session shared by CLI runs.

Measured on this deployment: the FIRST device program execution in any
fresh process pays an 8-200 s tunnel/session penalty (after which 32 MB
ships in ~1 s); every CLI invocation is a fresh process, so the device
compare kept losing its race to the host on fixed costs alone.  The
device server is the production answer — one resident process holds
the warm jax+PJRT session, the compiled program family, and the
device-side panel state; CLI runs talk to it over a unix socket at
local-socket speed and pay the session penalty ZERO times after the
daemon's first warmup.

This is the serving-path component the reference (a one-shot CPU
binary, `src/phylonium.cxx:89-299`) never needed: a TPU deployment
amortizes device state across requests or loses to its own latency.

Layout: wire.py (length-prefixed JSON + raw numpy frames), daemon.py
(the server; ``python -m phylonium_tpu.serve``), client.py
(connect-or-spawn client used by the stream feeder and query shipper).
"""
