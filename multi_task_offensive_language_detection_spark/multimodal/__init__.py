"""Multimodal binary-column plumbing (image/video counterparts of audio).

Payloads are opaque ``binary`` columns with typed metadata, processed in
Arrow batches. The audio path (operators/audio.py) and the IMAGE decode
path (codecs.py: from-scratch numpy BMP + PPM/PGM parsers) are fully
real; only video container DEMUX remains a clearly-marked stub (no
ffmpeg in this container) with real batch/explode semantics.
"""

from .binary_ops import (  # noqa: F401
    IMAGE_META_SCHEMA,
    frame_sample_stub,
    with_image_features,
)
from .codecs import (  # noqa: F401
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
)
