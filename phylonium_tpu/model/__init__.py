from phylonium_tpu.model.evo import EvoCounts  # noqa: F401
