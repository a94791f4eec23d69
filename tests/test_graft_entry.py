"""Driver entry points: multi-chip dry run + entry signature."""

import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_signature():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    assert callable(fn)
    assert isinstance(args, tuple) and len(args) == 2
    # don't run the full ViT-B/32 on CPU here (slow); the driver compile-checks it
