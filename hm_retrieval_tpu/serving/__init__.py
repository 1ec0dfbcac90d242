from hm_retrieval_tpu.serving.service import RetrievalService

__all__ = ["RetrievalService", "export_index_savedmodel"]


def export_index_savedmodel(*args, **kwargs):
    """Lazy alias for serving.savedmodel_export.export_index_savedmodel
    (keeps TensorFlow out of the import path unless actually used)."""
    from hm_retrieval_tpu.serving.savedmodel_export import (
        export_index_savedmodel as _impl,
    )

    return _impl(*args, **kwargs)
