from repconc_tpu.quant.codebook import (
    encode,
    decode,
    decode_gather,
    pairwise_sqdist,
    normalize_centroids,
    normalize_subvectors,
    subvector_view,
)
from repconc_tpu.quant.sinkhorn import sinkhorn_log, sinkhorn_assign, center_distances
from repconc_tpu.quant.losses import (
    straight_through,
    contrastive_loss,
    mse_loss,
    false_negative_mask,
    duplicate_negative_mask,
)
