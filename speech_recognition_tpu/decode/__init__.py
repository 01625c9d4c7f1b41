from speech_recognition_tpu.decode.isolated import score_models, classify_batch
from speech_recognition_tpu.decode.connected import (
    decode_connected,
    connected_graph_arrays,
)
