from phylonium_tpu.data.sequence import (  # noqa: F401
    Sequence,
    Genome,
    revcomp,
    filter_nucl,
    gc_content,
    join,
)
