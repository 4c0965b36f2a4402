"""PreferenceDataset path re-rooting (train.json from another machine)."""

from ospo_tpu.pipeline.datasets import PreferenceDataset


def _ds(root):
    ds = PreferenceDataset.__new__(PreferenceDataset)
    ds.data_root = root
    return ds


def test_resolve_path_anchors_at_last_base_component():
    """A foreign prefix containing a 'base' directory must not hijack the
    re-root: the step3 layout anchor is the LAST base|negative before the
    category dir."""
    ds = _ds("/roots/step3")
    out = ds.resolve_path("/mnt/base/ospo/outputs/step3/base/complex/12/00.png")
    assert out == "/roots/step3/base/complex/12/00.png"


def test_resolve_path_negative_kind():
    ds = _ds("/roots/step3")
    out = ds.resolve_path("/elsewhere/step3/negative/layout/0000001/02.png")
    assert out == "/roots/step3/negative/layout/0000001/02.png"


def test_resolve_path_existing_or_no_root_passthrough(tmp_path):
    p = tmp_path / "x.png"
    p.write_bytes(b"")
    ds = _ds("/roots/step3")
    assert ds.resolve_path(str(p)) == str(p)          # exists → untouched
    ds2 = _ds(None)
    assert ds2.resolve_path("/nope/base/a/b.png") == "/nope/base/a/b.png"


def test_resolve_path_no_anchor_passthrough():
    ds = _ds("/roots/step3")
    assert ds.resolve_path("/x/y/z.png") == "/x/y/z.png"
