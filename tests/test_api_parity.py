"""Every public symbol of the reference must resolve to a counterpart.

Drives tools/api_parity.py: same-name coverage in the mapped module,
or an entry in its documented rename/redesign table.  A new reference
symbol (or an accidental removal on our side) fails here.
"""

import importlib.util
import os


def _load_tool():
    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "tools", "api_parity.py")
    spec = importlib.util.spec_from_file_location("api_parity", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_reference_api_fully_accounted():
    tool = _load_tool()
    covered, mapped, missing = tool.audit()
    assert not missing, f"unaccounted reference API: {missing}"
    # sanity floor so an emptied JUNK/module list can't fake a pass
    assert len(covered) >= 95, len(covered)
    assert len(mapped) >= 10, len(mapped)


def test_resolution_targets_exist():
    """Every mapped target in the table must actually resolve."""
    tool = _load_tool()
    for (ref_mod, name), (target, note) in tool.RESOLUTIONS.items():
        if target is not None:
            assert tool._resolve(target), (ref_mod, name, target)
