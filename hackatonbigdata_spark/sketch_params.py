"""Shared sketch parameters — ONE definition for every engine.

The stream kernels (``streaming/jobs.py``), their oracled batch twins
(``operators/streaming_batch.py``), and the batch gates (``operators/
llm.py``) must agree bit-for-bit on these constants: the stream == batch
equality contract and the byte-identical oracle SQL both derive from
them, so a change here is a change everywhere (the ``BLOOM_K`` lesson —
previously each module re-declared its own copy and only comments plus
tests guarded against drift).

Leaf module by design: imports nothing from the package, so both the
operators and the streaming kernels can depend on it without cycles.
"""

BLOOM_M = 1024  # Bloom filter bits (stream twin == dedup_bloom_gate grid)
BLOOM_K = 4  # Bloom hash functions

HLL_M = 64  # HyperLogLog registers (p=6)
HLL_W = 52  # hash window bits observed per key (13 md5 hex chars)
HLL_ALPHA64 = 0.709  # Flajolet et al. 2007 bias constant for m=64

KLL_K = 32  # quantile-sketch compactor capacity (items per level)
KLL_LEVELS = 14  # level budget: covers KLL_K * 2^14 ≈ 524k items per key
