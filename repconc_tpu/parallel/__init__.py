from repconc_tpu.parallel.sharded import (
    sharded_flat_search,
    sharded_adc_search,
    sharded_encode_fn,
)
