"""moai_tpu — a TPU-native CKKS FHE library and encrypted-transformer runtime.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
petitioner/MOAI-FHE-TransformerInference-Public (CPU/C++/SEAL): RNS-CKKS
homomorphic encryption with bootstrapping, encrypted matmuls and polynomial
nonlinearities, and a fully-encrypted BERT-base inference runtime.
"""

__version__ = "0.1.0"
