from multimodalautoencoder_tpu.parallel import mesh, grid_trainer

__all__ = ["mesh", "grid_trainer"]
