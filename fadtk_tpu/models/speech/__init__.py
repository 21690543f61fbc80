from .config import SpeechEncoderConfig
from .encoder import speech_encoder_forward, init_speech_encoder_params

__all__ = ["SpeechEncoderConfig", "speech_encoder_forward", "init_speech_encoder_params"]
