from dynavsr_tpu.train.losses import charbonnier_loss
from dynavsr_tpu.train.schedules import cosine_annealing_restart, multistep_restart
