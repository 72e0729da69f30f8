#!/usr/bin/env python
"""CLI entry point: ``python trainer.py --config configs/<x>.yaml key=val ...``
— same invocation shape as the reference driver (reference: trainer.py:192-200).
"""

import os

# jax is pre-imported at interpreter startup in some environments, so the
# JAX_PLATFORMS env var alone may not take effect; apply it via config
# before any backend use.
if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from tssplat_tpu.train import main  # noqa: E402

if __name__ == "__main__":
    main()
