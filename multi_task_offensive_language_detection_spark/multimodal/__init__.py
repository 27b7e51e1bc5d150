"""Multimodal binary-column plumbing (image/video counterparts of audio).

Payloads are opaque ``binary`` columns with typed metadata, processed by
``mapInPandas`` in Arrow batches. The audio path (operators/audio.py) is
fully real; image/video DECODE is stubbed (libs absent in this container)
behind deterministic fakes — but the Spark-side plumbing (schemas, batch
shapes, partition behavior) is real and tested.
"""

from .binary_ops import (  # noqa: F401
    IMAGE_META_SCHEMA,
    decode_image_stub,
    frame_sample_stub,
    with_image_features,
)
