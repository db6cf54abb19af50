from phylonium_tpu.core.homology import Homology, FORWARD, REVERSE  # noqa: F401
