from repconc_tpu.models.transformer import DenseEncoder, TransformerEncoder
from repconc_tpu.models.auto import (
    load_dense_encoder,
    encoder_config_from_hf,
    convert_hf_weights,
)
from repconc_tpu.models import repconc_model
