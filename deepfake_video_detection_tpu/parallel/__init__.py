from deepfake_video_detection_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
from deepfake_video_detection_tpu.parallel.multihost import (  # noqa: F401
    global_batch_from_local,
    local_batch_size,
)
from deepfake_video_detection_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_blocks,
)
