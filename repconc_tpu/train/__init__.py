from repconc_tpu.train.warmup import warmup_from_embeds
