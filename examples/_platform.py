"""Platform escape hatch shared by the example scripts.

`--platform=cpu` (or `--platform cpu`) / the GPUNTT_PLATFORM env var
force the JAX backend via jax.config.update before first backend use.
A plain JAX_PLATFORMS env var is NOT enough on boxes where a site
plugin overrides it (the axon TPU relay does), and a wedged relay makes
the default backend hang — this flag keeps the quick-start honest on
shared hardware.
"""

import os
import sys


def apply():
    plat = None
    argv = sys.argv
    i = 1
    while i < len(argv):
        a = argv[i]
        if a.startswith("--platform="):
            plat = a.split("=", 1)[1]
            del argv[i]
            continue
        if a == "--platform" and i + 1 < len(argv):
            plat = argv[i + 1]
            del argv[i:i + 2]
            continue
        i += 1
    plat = plat or os.environ.get("GPUNTT_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
