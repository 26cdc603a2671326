"""CrossScore-TPU: a TPU-native (JAX/Flax/Pallas) framework for reference-based,
ground-truth-free quality assessment of novel-view-synthesis renders.

Re-designed from scratch for TPU hardware with the capabilities of
ActiveVisionLab/CrossScore (see SURVEY.md for the structural analysis of the
reference implementation at /root/reference).

Subpackages
-----------
- ``confsys``  : hydra-style YAML config composition + dotted CLI overrides
- ``ops``      : primitive numerics (jigsaw, interpolation, metrics, attention
                 incl. the fused Pallas flash cross-attention kernel)
- ``models``   : Flax modules (DINOv2 ViT encoder, multi-view PE,
                 cross-reference decoder, regression head, CrossScoreNet)
- ``parallel`` : device mesh + sharding strategy (SPMD data/tensor parallel)
- ``train``    : optax optimizer/schedule assembly and jitted train/eval steps
- ``data``     : dataset indexing, neighbour sampling, crops, host loader
- ``io``       : image/metric-map codecs, batch writers, score summarisers,
                 orbax checkpointing, torch-checkpoint conversion
- ``tasks``    : train/test/predict CLI entry points (same public interface as
                 the reference: ``python -m crossscore_tpu.tasks.predict ...``)
"""

__version__ = "0.1.0"
