"""Third multimodal column family: video payloads as opaque binary
columns with typed metadata (see images/ and audio/ for the siblings)."""
