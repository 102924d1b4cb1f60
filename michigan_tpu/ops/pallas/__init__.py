"""Hand-written TPU kernels for the hot ops (SURVEY §7 build plan #6).

Each kernel has an XLA-composed fallback; `interpret=True` is used
automatically off-TPU so tests run on CPU.
"""

from michigan_tpu.ops.pallas.spade import fused_instance_norm, spade_modulate
from michigan_tpu.ops.pallas.filterbank import filterbank_orientation
