from quber_tpu.evaluation.metrics import multilabel_metrics, boundary_overlap, seg2bmap

__all__ = ["multilabel_metrics", "boundary_overlap", "seg2bmap"]
