from .fad import FrechetAudioDistance, FADInfResults

__all__ = ["FrechetAudioDistance", "FADInfResults"]
