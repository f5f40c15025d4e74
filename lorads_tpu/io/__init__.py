from lorads_tpu.io.sdpa import read_sdpa, write_sdpa
from lorads_tpu.io import generators

__all__ = ["read_sdpa", "write_sdpa", "generators"]
