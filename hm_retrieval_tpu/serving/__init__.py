from hm_retrieval_tpu.serving.service import RetrievalService

__all__ = ["RetrievalService"]
