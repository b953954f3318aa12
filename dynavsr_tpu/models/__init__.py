"""Network architectures (flax.linen, NHWC, static shapes).

Reference parity: models/archs/ in esw0116/DynaVSR (SURVEY.md §2.1) —
EDVR (PCD + TSA), TOF (SpyNet), DUF, MFDN/SFDN downscalers — re-designed
for TPU: channels-last, bf16-capable compute dtype, trunk res-blocks rolled
into nn.scan (one compiled body), all control flow static.
"""

from dynavsr_tpu.models.networks import define_G
