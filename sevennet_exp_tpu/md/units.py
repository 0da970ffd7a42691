"""MD unit system: eV / Angstrom / amu (ASE-compatible constants).

Internal time unit is A*sqrt(amu/eV) ~= 10.1805 fs.
"""

import math

# CODATA-derived, matching ase.units to float64 precision
kB = 8.617330337217213e-05          # eV / K
fs = 0.09822694750253721            # internal time per femtosecond
ps = 1000.0 * fs
GPa = 160.21766208                  # eV/A^3 -> GPa is 1/GPa... (1 eV/A^3 = 160.2 GPa)
bar = 1.0 / (1.602176634e6 / 1e5)   # placeholder; stress conversions in _const


def fs_to_internal(t_fs: float) -> float:
    return t_fs * fs


def internal_to_fs(t: float) -> float:
    return t / fs
