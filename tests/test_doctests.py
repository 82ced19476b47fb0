"""Doctest collection — the reference's ``--doctest-modules`` analog.

The reference pyproject declares ``--doctest-modules`` in its pytest addopts
(reference: Matcha-TTS/pyproject.toml) but ships no tests/ directory, so its
doctests (e.g. the SnakeBeta example, transformer.py:29-33) never actually
run.  Here the example-bearing host-side modules are doctest-collected
explicitly; a blanket --doctest-modules over the package would import every
module (pulling jax/TPU init into lightweight host tooling), so the list is
curated to pure-host modules.
"""

import doctest

import pytest

MODULES = [
    "emojivoice_tpu.text.numbers",
    "emojivoice_tpu.apps.emoji",
]


@pytest.mark.parametrize("modname", MODULES)
def test_doctests(modname):
    mod = __import__(modname, fromlist=["_"])
    results = doctest.testmod(mod, verbose=False)
    assert results.attempted > 0, f"{modname} has no doctest examples"
    assert results.failed == 0


def test_every_example_bearing_module_is_collected():
    """Any package module that grows ``>>>`` examples must be added to
    MODULES (or justify its exclusion) — keeps the analog honest."""
    from pathlib import Path

    import emojivoice_tpu

    pkg_root = Path(emojivoice_tpu.__file__).parent
    with_examples = {
        "emojivoice_tpu." + str(p.relative_to(pkg_root))[:-3].replace("/", ".")
        for p in pkg_root.rglob("*.py")
        if ">>> " in p.read_text()
    }
    missing = with_examples - set(MODULES)
    assert not missing, f"doctest-bearing modules not collected: {sorted(missing)}"
