"""deepestscatter_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-design of the
"Faster RPNN" cloud-rendering pipeline (capability parity with
marsermd/DeepestScatter, see /root/repo/SURVEY.md).

Subpackages
-----------
- ``ops``       low-level compute: density grids + mip pyramids, Lorenz–Mie
                phase tables, RNG, Welford statistics, tone mapping,
                tetrahedral interpolation, hierarchical descriptors.
- ``render``    cameras, the progressive Monte-Carlo path tracer (3 scatter
                modes), the in-scatter (sun transmittance) bake, and the
                neural renderers (RPNN and baked light probes).
- ``models``    Flax implementations of the RPNN block/models
                (DisneyModel, LightProbeModel, ProbeRendererModel, BakedModel).
- ``train``     training harness (log-space MSE, Adam-amsgrad, checkpoints).
- ``data``      record schemas, the native record store, the 4 collectors and
                scene-setup generation.
- ``parallel``  device-mesh construction and sharded render/train steps.
- ``utils``     EXR/PNG IO, profiling helpers.
"""

__version__ = "0.1.0"
