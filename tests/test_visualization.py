"""Visualization smoke tests (Agg backend, no display)."""

import numpy as np

from drsa_audio_tpu.utils.visualization import (
    bwr_heatmap_colors, vis_heatmap, plot_spectrogram, plot_waveform,
    plot_aupcs, plot_train_stats, plot_drsa_objective, make_drsa_subplot,
)


def test_bwr_colors():
    hm = np.array([[-1.0, 0.0], [0.5, 1.0]])
    rgb = bwr_heatmap_colors(hm)
    assert rgb.shape == (2, 2, 3)
    np.testing.assert_allclose(rgb[0, 0], [0, 0, 1], atol=1e-9)   # negative -> blue
    np.testing.assert_allclose(rgb[0, 1], [1, 1, 1], atol=1e-9)   # zero -> white
    np.testing.assert_allclose(rgb[1, 1], [1, 0, 0], atol=1e-9)   # positive -> red


def test_plots_smoke(rng):
    hm = rng.standard_normal((64, 64))
    vis_heatmap(hm, title="t")
    plot_spectrogram(rng.standard_normal((64, 64)), case="toy")
    plot_waveform(rng.standard_normal(16000))
    plot_aupcs({"a": np.array([[1.0]])},
               {"a": np.linspace(1, 0, 7)}, [0, 1, 4, 9, 16, 25, 9])
    plot_train_stats({"train_loss": [1, 0.5], "valid_losses": [1.1, 0.6],
                      "train_acc": [0.5, 0.8], "valid_acc": [0.4, 0.7]})
    plot_drsa_objective(np.random.rand(3, 50))
    make_drsa_subplot(rng.standard_normal((64, 64)),
                      rng.standard_normal((64, 64)),
                      [rng.standard_normal((64, 64)) for _ in range(2)],
                      case="toy")
