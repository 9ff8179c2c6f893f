from .media import (
    MEDIA_SCHEMA,
    audio_features,
    decode_image_stats,
    gen_media,
    image_resize,
    video_sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "audio_features",
    "decode_image_stats",
    "gen_media",
    "image_resize",
    "video_sample_frames",
]
