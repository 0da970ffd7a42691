"""Pretrained-keyword resolution (reference sevenn/util.py:188-207).

The reference maps '7net-0'-style names to packaged checkpoints; this
repo ships no upstream weights, so keywords resolve against
$SEVENNET_CHECKPOINT_DIR / the repo root (committed demo potential),
and unknown names / missing files error helpfully.
"""

import os

import pytest

from sevennet_exp_tpu.util import pretrained_name_to_path, resolve_checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_demo_keyword_resolves():
    p = pretrained_name_to_path('7net-0-nacl-demo')
    assert p.endswith('trained_nacl/checkpoint_best.pth.sevennet')
    assert os.path.isfile(p)
    # alias + case-insensitive
    assert pretrained_name_to_path('SevenNet-0-NaCl-Demo') == p


def test_unknown_name_lists_keywords():
    with pytest.raises(ValueError, match='7net-0'):
        pretrained_name_to_path('7net-9000')


def test_known_name_missing_file_reports_search_paths(monkeypatch):
    monkeypatch.setenv('SEVENNET_CHECKPOINT_DIR', '/nonexistent-root')
    with pytest.raises(FileNotFoundError, match='/nonexistent-root'):
        pretrained_name_to_path('7net-l3i5')


def test_env_dir_precedence(tmp_path, monkeypatch):
    rel = 'SevenNet_l3i5/checkpoint_l3i5.pth'
    f = tmp_path / rel
    f.parent.mkdir(parents=True)
    f.write_bytes(b'x')
    monkeypatch.setenv('SEVENNET_CHECKPOINT_DIR', str(tmp_path))
    assert pretrained_name_to_path('7net-l3i5') == str(f)


def test_resolve_checkpoint_passthrough(tmp_path):
    f = tmp_path / 'cp.pth'
    f.write_bytes(b'x')
    assert resolve_checkpoint(str(f)) == str(f)
    # non-keyword, non-path strings pass through untouched (caller errors)
    assert resolve_checkpoint('no/such/file.pth') == 'no/such/file.pth'


def test_calculator_accepts_keyword():
    from sevennet_exp_tpu.checkpoint import SevenNetCheckpoint
    cp = SevenNetCheckpoint('7net-0-nacl-demo')
    assert os.path.isfile(cp.checkpoint_path)
    cfg = cp.config
    assert cfg is not None
