"""TPU-native monocular visual odometry / SfM engine.

A brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference C++/OpenCV/g2o pipeline (felixchenfy/Monocular-Visual-Odometry),
re-designed TPU-first:

- ``ops``       stateless geometry / feature kernels (jnp + Pallas)
- ``models``    the VO pipeline: frontend, state pytrees, tracking, BA
- ``parallel``  device-mesh sharding: distributed windowed BA
- ``utils``     config, trajectory I/O, logging, profiling, checkpointing
- ``data``      synthetic benchmark generator + image-folder datasets
- ``viz``       offline trajectory / match visualization (replaces PCL/GUI)
- ``runtime``   native C++ host runtime (image decode, prefetching loader)

Everything device-side is jit-compiled over fixed-capacity masked arrays
(static shapes); there is no data-dependent Python control flow on the hot
path.  See SURVEY.md for the capability map against the reference.
"""

__version__ = "0.1.0"

from monocular_visual_odometry_tpu.utils.config import VOConfig, load_config

__all__ = ["VOConfig", "load_config", "__version__"]
