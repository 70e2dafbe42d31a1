from deepfake_video_detection_tpu.utils.tree import (  # noqa: F401
    flatten_dotted,
    unflatten_dotted,
    tree_size,
)
from deepfake_video_detection_tpu.utils.graph import (  # noqa: F401
    normalize_adjacency,
    chain_adjacency,
    fully_connected_adjacency,
)
