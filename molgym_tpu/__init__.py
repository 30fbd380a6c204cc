"""molgym-tpu: TPU-native RL framework for 3D molecular design."""
from molgym_tpu.version import __version__  # noqa: F401
