from .pipeline import (
    FEATURE_DIM,
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    attach_fake_payloads,
    extract_features,
    frame_sample,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_DIM",
    "FEATURE_SCHEMA",
    "attach_fake_payloads",
    "extract_features",
    "frame_sample",
]
