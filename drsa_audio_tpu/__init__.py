"""drsa_audio_tpu: TPU-native rebuild of sharckhai/drsa-audio.

Importing the package enables JAX's persistent compilation cache
(utils/compcache.py) — every entry point (bench, workflow scripts,
serving, tests) re-runs known programs, and on this container a cold
remote compile costs minutes. Opt out with DRSA_COMPCACHE=0.
"""

from drsa_audio_tpu.utils import compcache as _compcache

_compcache.enable()
