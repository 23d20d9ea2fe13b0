"""dumpvdl2_tpu — a TPU-native VDL Mode 2 receive and decode framework.

A from-scratch reimplementation of the capabilities of szpajder/dumpvdl2
designed for JAX/XLA/Pallas on TPU: the signal chain (channelize,
demodulate, FEC) runs as batched, block-based array programs over a
device mesh; the byte-level protocol stack (AVLC, ACARS, X.25/CLNP/COTP,
ICAO ULCS applications) and the formatter/output matrix run on the host.
"""

__version__ = "0.1.0"
