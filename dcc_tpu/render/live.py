"""Live interactive viewer — the workstation analog of the reference's
pyglet window.

The reference opens an OpenGL viewer during training (`multiagent/
rendering.py:45-147`, human mode at `environment.py:209-315`); dcc_tpu's
default "human" mode returns tiled frame arrays and writes GIFs — the right
behavior on a headless TPU host — but a user at a workstation could not
watch training live. :class:`LiveViewer` closes that gap with a matplotlib
figure window fed by the same PIL frame renderer the GIF writer uses
(:func:`dcc_tpu.render.gif.draw_frame`), so both paths always show the same
picture.

Headless-safe by construction: when no GUI backend is available (no
$DISPLAY, Agg forced, or matplotlib missing) the viewer degrades to a
frame sink — ``show()`` still accepts frames and records the latest one
(``last_frame``), it just cannot open a window. ``interactive`` reports
which mode was reached, and nothing in the training loop has to care.

Usage::

    viewer = LiveViewer(title="dcc_tpu training")
    for frame in frames:          # (H, W, 3) uint8 arrays
        viewer.show(frame)        # draws + processes GUI events
    viewer.close()

The Learner wires this behind the ``render_live: true`` config key
(``runtime/learner.py``; also reachable as ``python train.py
--render-live``): at every render interval the episode's frame list — the
same (tiled, for multi-env render farms) frames the GIF writer produced —
is replayed through ``show()``. With ``save_gifs: false`` the frames are
drawn for the viewer alone and no GIF is written.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class LiveViewer:
    """Incremental frame viewer over matplotlib's interactive mode."""

    def __init__(self, title: str = "dcc_tpu", pause_s: float = 0.001):
        self.title = title
        self.pause_s = pause_s
        self.last_frame: Optional[np.ndarray] = None
        self._fig = None
        self._im = None
        self.interactive = False
        try:
            import matplotlib

            # a GUI backend must already be selected; never force one.
            # NB: GUI backends like TkAgg/QtAgg/GTK4Agg *contain* "agg", so
            # membership in the known NON-GUI set is the right test — not a
            # substring check.
            backend = matplotlib.get_backend().lower()
            non_gui = {"agg", "pdf", "svg", "ps", "pgf", "cairo", "template"}
            if backend in non_gui:
                return  # pure raster/vector backend: no window possible
            import matplotlib.pyplot as plt

            self._plt = plt
            plt.ion()
            self.interactive = True
        except Exception:
            # matplotlib missing or backend import failed: frame-sink mode
            self.interactive = False

    def show(self, frame: np.ndarray) -> None:
        """Display one (H, W, 3) uint8 frame (no-op window-wise when
        headless; the frame is still recorded in ``last_frame``)."""
        self.last_frame = np.asarray(frame)
        if not self.interactive:
            return
        plt = self._plt
        if self._fig is None:
            self._fig, ax = plt.subplots(num=self.title)
            ax.set_axis_off()
            self._im = ax.imshow(self.last_frame)
            self._fig.canvas.manager.set_window_title(self.title)
        else:
            self._im.set_data(self.last_frame)
        self._fig.canvas.draw_idle()
        plt.pause(self.pause_s)  # processes GUI events

    def close(self) -> None:
        if self._fig is not None:
            self._plt.close(self._fig)
            self._fig = None
