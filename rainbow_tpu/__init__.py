"""rainbow-tpu: a TPU-native Rainbow DQN framework (JAX/XLA/Pallas).

Brand-new re-architecture of the capability set of Kaixhin/Rainbow
(reference mounted at /root/reference) for TPU hardware. See SURVEY.md.
"""
from rainbow_tpu.config import (RainbowConfig, canonical, data_efficient,
                                throughput)

__version__ = "0.4.0"
