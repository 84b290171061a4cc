"""Physical constants (reference epgpy/utils.py:8-9)."""

gamma_1H = 42.576e3  # kHz/T
gamma_23Na = 11.262e3  # kHz/T
