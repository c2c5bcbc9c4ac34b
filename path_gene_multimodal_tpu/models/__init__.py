"""Flax model zoo (TPU-native replacements for the torch models the
reference delegates to its external engines):

- ``clip``      — CLIP image+text towers (Mussel's tile/class embedding
                  models, reference extract_embedding_from_tiles.py /
                  create_embedding.py); also the Virchow2-style ViT config.
- ``hovernext`` — ConvNeXtV2 encoder + NP/HV/TP decoder heads (the
                  reference's ``pannuke_convnextv2_tiny_3`` checkpoint,
                  hovernet_inference.py).
- ``resnet``    — ResNet34 + IDaRS heads (TIAToolbox's
                  ``resnet34-idars-*`` molecular predictors,
                  molecular_feature_extraction.py:21-28).
- ``weights``   — torch→Flax state-dict converters for all of the above,
                  validated to ≥0.999 output cosine in tests.

All models run in bfloat16 on the MXU with float32 accumulation, static
shapes, and batch-axis sharding via ``parallel``.
"""
