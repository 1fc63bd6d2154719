from ssak_tpu.augment.speech import SpeechAugment
from ssak_tpu.augment.specaugment import spec_augment

__all__ = ["SpeechAugment", "spec_augment"]
