from pathlib import Path

import numpy as np
import pytest

from segmantic_tpu.core.volume import Volume, affine_from_spacing_origin
from segmantic_tpu.data.iseg import iSegSaver, export_to_iseg, voxel_sizes


@pytest.fixture
def labels():
    return {0: ("BG", 0.0, 0.0, 0.0), 1: ("FG", 1.0, 1.0, 1.0)}


def _vol():
    arr = np.zeros((1, 5, 5, 5), dtype=np.uint16)
    for k in range(5):
        arr[0, :, :, k] = k
    v = Volume(data=arr, affine=affine_from_spacing_origin((0.5, 0.6, 0.7)))
    v.meta["filename"] = "case0.nii.gz"
    return v


def test_voxel_sizes():
    aff = affine_from_spacing_origin((0.5, 0.6, 0.7))
    np.testing.assert_allclose(voxel_sizes(aff), [0.5, 0.6, 0.7])


def test_export_structure(tmp_path, labels):
    import h5py

    vol = _vol()
    path = tmp_path / "out.h5"
    export_to_iseg(path, vol.numpy()[0], vol.numpy()[0], vol.affine, labels)
    with h5py.File(path) as f:
        assert f["Tissue"].dtype == np.uint16
        assert f["Tissue"].shape == (125,)
        assert f["Source"].shape == (125,)
        assert np.all(f["Target"][:] == 0)
        np.testing.assert_allclose(f["pixelsize"][:], [0.5, 0.6, 0.7])
        np.testing.assert_allclose(f["dimensions"][:], [5, 5, 5])
        assert "FG" in f["Tissues"]
        assert f["Tissues/FG/index"][0] == 1
        np.testing.assert_allclose(f["Tissues/FG/rgbo"][:], [1, 1, 1, 0.5])


def test_iseg_saver_missing_key_tolerance(tmp_path, labels):
    vol = _vol()
    out = tmp_path / "output"
    saver = iSegSaver(
        keys=["image", "label"],
        image_key="image",
        label_key="label",
        label_dict=labels,
        output_dir=out,
        separate_folder=False,
        allow_missing_keys=True,
        print_log=False,
    )
    saver({"image": vol, "label": vol})
    files = list(out.glob("*.h5"))
    assert len(files) == 1
    files[0].unlink()

    saver({"label": vol})
    assert len(list(out.glob("*.h5"))) == 1
    list(out.glob("*.h5"))[0].unlink()

    saver({"image": vol})
    assert len(list(out.glob("*.h5"))) == 1


def test_iseg_saver_requires_keys(tmp_path, labels):
    saver = iSegSaver(
        keys=["image", "label"],
        label_dict=labels,
        output_dir=tmp_path,
        allow_missing_keys=False,
    )
    with pytest.raises(RuntimeError):
        saver({"image": _vol()})
