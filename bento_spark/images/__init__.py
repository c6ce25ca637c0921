"""Image multimodal column family: opaque binary PNG payloads with typed
metadata, decoded/feature-extracted via Arrow-batched pandas stages —
the second instance of the audio package's multimodal contract."""
