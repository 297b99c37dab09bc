from quber_tpu.ops import morphology, preprocess, encoding, grouping

__all__ = ["morphology", "preprocess", "encoding", "grouping"]
