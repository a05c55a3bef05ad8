"""ractip_tpu: a TPU-native RNA-RNA interaction prediction framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
reference RactIP tool (Kato et al., Bioinformatics 2010/2017): thermodynamic
partition-function DPs for base-pairing, hybridization and accessibility
probabilities, and a joint-structure optimizer, built batch-first for TPU
device meshes.
"""

__version__ = "0.1.0"
