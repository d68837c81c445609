from eigenpinns_tpu.configs.config import Config

__all__ = ["Config"]
