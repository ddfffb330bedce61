"""droid_slam_reserch_tpu — a TPU-native deep visual SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
DROID-SLAM research fork (mono/stereo/RGB-D deep SLAM + multisession stereo
map fusion), built TPU-first:

- ``lie``        quaternion SE3/SO3/Sim3 ops as pure JAX functions
- ``geom``       differentiable projective geometry + analytic Jacobians
- ``ba``         dense bundle adjustment (Gauss-Newton + Schur) on-device
- ``ops``        correlation volumes / fused Pallas correlation lookup
- ``models``     Flax feature/context encoders + ConvGRU update operator
- ``engine``     SLAM runtime: keyframe buffer, motion filter, factor graph,
                 frontend, backend, trajectory filler, Droid facade
- ``data``       dataset streams (TUM / EuRoC / TartanAir / ETH3D / generic)
- ``parallel``   device-mesh sharding for distributed BA and training
- ``train``      losses + unrolled training loop (data parallel via pjit)
- ``eval``       trajectory metrics (ATE/RPE, Umeyama alignment)
- ``multisession`` map alignment + joint BA across sessions
- ``utils``      config, timing, checkpointing
"""

__version__ = "0.1.0"
