import numpy as np

from differender_tpu.plotting import (plot_tf, plot_tfs, plot_comp_render_tf,
                                      save_image, save_histogram, save_gif)
from differender_tpu.transfer import get_tf


def test_plot_tfs(tmp_path):
    tf = np.asarray(get_tf("tf1", 64))
    p = tmp_path / "tfs.png"
    plot_tfs([(tf, "target"), (tf * 0.5, "pred")], path=str(p))
    assert p.exists() and p.stat().st_size > 1000


def test_plot_comp_render_tf(tmp_path):
    img = np.random.default_rng(0).random((4, 16, 16)).astype(np.float32)
    tf = np.asarray(get_tf("tf5", 32))
    p = tmp_path / "comp.png"
    plot_comp_render_tf([(img, tf, "Prediction"), (img, tf, "Target")],
                        path=str(p), suptitle="step 1")
    assert p.exists() and p.stat().st_size > 1000


def test_save_image_and_histogram(tmp_path):
    img = np.random.default_rng(0).random((16, 16, 4)).astype(np.float32)
    save_image(img, str(tmp_path / "img.png"))
    save_image(np.transpose(img, (2, 0, 1)), str(tmp_path / "img2.png"))
    save_histogram(img, str(tmp_path / "hist.png"))
    for n in ["img.png", "img2.png", "hist.png"]:
        assert (tmp_path / n).exists()


def test_save_gif(tmp_path):
    frames = [np.random.default_rng(i).random((8, 8, 3)) for i in range(4)]
    p = tmp_path / "anim.gif"
    save_gif(frames, str(p), fps=4)
    assert p.exists() and p.stat().st_size > 100
