from multimodalautoencoder_tpu.sweep import grid, engine, wrappers

__all__ = ["grid", "engine", "wrappers"]
