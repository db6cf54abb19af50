from phylonium_tpu.index.esa import ESAIndex, build_esa  # noqa: F401
