from speech_recognition_tpu.parallel.mesh import make_mesh, bank_sharding, batch_sharding
from speech_recognition_tpu.parallel.trainer import (
    make_sharded_embedded_step,
    shard_embedded_inputs,
)
