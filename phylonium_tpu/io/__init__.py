from phylonium_tpu.io.fasta import read_fasta, read_genome, extract_genome  # noqa: F401
from phylonium_tpu.io.phylip import format_matrix  # noqa: F401
