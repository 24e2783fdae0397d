"""TPU-native PMR446 SDR framework (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of the sdr_pmr446 C reference
as pure block-functions over static shapes with an explicit carried-state
pytree, built for batch throughput on TPU.
"""

__version__ = "0.1.0"
