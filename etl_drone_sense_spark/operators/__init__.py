from . import dedup, feature_transform, multimodal, sessionize, similarity  # noqa: F401
