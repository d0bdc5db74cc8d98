from repconc_tpu.index.kmeans import assign, kmeans_fit, kmeans_fit_from, pq_fit, pq_encode_chunked
from repconc_tpu.index.opq import opq_fit, random_rotation, subsample_for_training
from repconc_tpu.index.flat import flat_search, batch_flat_search
from repconc_tpu.index.adc import build_lut, score_codes, adc_search, batch_adc_search
