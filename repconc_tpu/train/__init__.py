from repconc_tpu.train.warmup import warmup_from_embeds
from repconc_tpu.train import data, stage1, stage2
