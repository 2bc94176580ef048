from multimodalautoencoder_tpu.models import mmae, losses, corruption

__all__ = ["mmae", "losses", "corruption"]
