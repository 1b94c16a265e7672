import numpy as np

from segmantic_tpu.image.labels import save_tissue_list
from segmantic_tpu.viz.plots import (
    make_random_cmap,
    make_tissue_cmap,
    plot_confusion_matrix,
)


def test_tissue_cmap(tmp_path):
    save_tissue_list({"Bone": 1, "Fat": 2}, tmp_path / "t.txt")
    cmap = make_tissue_cmap(tmp_path / "t.txt")
    assert cmap.N == 3
    assert cmap(0) == (0.0, 0.0, 0.0, 1.0)


def test_random_cmap_deterministic():
    a = make_random_cmap(5, seed=1)
    b = make_random_cmap(5, seed=1)
    assert a.colors == b.colors
    assert a.N == 5


def test_plot_confusion_matrix(tmp_path):
    cm = np.array([[50, 2], [3, 45]])
    out = tmp_path / "cm.png"
    plot_confusion_matrix(cm, ["bg", "fg"], out, title="test")
    assert out.exists()
    assert out.stat().st_size > 1000
