from deepfake_video_detection_tpu.checkpoint.torch_bridge import (  # noqa: F401
    extract_state_dict,
    normalize_state_dict_keys,
    infer_ensemble_count,
    import_into_variables,
    export_to_torch_state_dict,
    load_torch_file,
    detect_fake_index,
)
