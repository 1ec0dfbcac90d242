from hm_retrieval_tpu.utils.settings import Settings

__all__ = ["Settings"]
