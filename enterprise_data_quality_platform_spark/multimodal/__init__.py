from .codecs import (
    png_decode,
    png_encode,
    png_features,
    sniff_format,
    wav_decode,
    wav_encode,
    wav_features,
)
from .pipeline import (
    FEATURE_DIM,
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    attach_fake_payloads,
    attach_real_payloads,
    decode_payload,
    extract_features,
    frame_sample,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_DIM",
    "FEATURE_SCHEMA",
    "attach_fake_payloads",
    "attach_real_payloads",
    "decode_payload",
    "extract_features",
    "frame_sample",
    "png_encode",
    "png_decode",
    "png_features",
    "wav_encode",
    "wav_decode",
    "wav_features",
    "sniff_format",
]
