"""Data layer: IO, windowing, MATLAB-parity resize, degradation synthesis.

Reference parity targets (SURVEY.md §2.4): data/util.py (imresize_np,
bgr2ycbcr, index_generation, duf_downsample), REDS/Vimeo90K/video_test
datasets, and the DynaVSR meta-learning (SLR, LR, HR) triple synthesis.
"""

from dynavsr_tpu.data.resize import imresize_np, imresize, resize_weights
from dynavsr_tpu.data.color import bgr2ycbcr, rgb2ycbcr
from dynavsr_tpu.data.windows import index_generation
