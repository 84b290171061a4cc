"""n-dimensional / float-wavenumber shifts (static-capacity redesign).

Implements the reference's shift-nd / shift-merge / shift-prune methods
(reference epgpy/shift.py:297-542) with static shapes.  Placeholder until
the coordinate-table kernels land.
"""

from __future__ import annotations


def apply_shift(op, sm):
    raise NotImplementedError(
        "n-D / float shifts land in the shiftnd milestone; "
        "only integer 1-D shifts are available so far"
    )
