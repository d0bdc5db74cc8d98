from repconc_tpu.core.config import (
    EncoderConfig,
    RepConcConfig,
    METRIC_IP,
    METRIC_COS,
    METRIC_CENTROID_COS,
)
from repconc_tpu.core.mesh import create_mesh, data_sharding, replicated_sharding, DATA_AXIS
from repconc_tpu.core import checkpoint
