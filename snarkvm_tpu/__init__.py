"""snarkvm_tpu — a TPU-native zkSNARK framework with the capabilities of snarkVM.

Built from scratch on JAX/XLA/Pallas. See SURVEY.md for the blueprint.
"""
__version__ = "0.1.0"
