"""Optional Qt shell for the viewer (requires PyQt6 + a display).

A thin windowed wrapper over the headless MVC backend: a control panel
(play/pause, frame slider, dB toggle, movie export) plus a 2x2 grid of
matplotlib canvases whose views subscribe to the controller's payload stream —
the reference ``MainWindow`` / ``ControlPanel`` / ``ProcessorViewPanel``
architecture (``gui/main_window.py``, ``gui/control_panel.py``,
``gui/processor_view_panel.py``) with matplotlib in place of pyqtgraph.
The import is deferred so the rest of the package never needs Qt.
"""

from __future__ import annotations

from typing import List, Optional


def run_qt_viewer(controller, view_keys: Optional[List[str]] = None,
                  interval_ms: int = 50):
    """Open the viewer window and start the Qt event loop.

    Playback uses a ``QTimer`` at ``interval_ms`` (the reference's 50 ms /
    20 FPS target, ``mmwave_radar_processor_controller.py:170``).
    """
    from PyQt6 import QtCore, QtWidgets
    from matplotlib.backends.backend_qtagg import FigureCanvasQTAgg
    from matplotlib.figure import Figure

    from mmwave_radar_processing_tpu.visualization.views import VIEW_CLASSES

    view_keys = view_keys or list(controller.processors)[:4]

    class MainWindow(QtWidgets.QMainWindow):
        def __init__(self):
            super().__init__()
            self.setWindowTitle("mmWave Radar Viewer (TPU)")
            central = QtWidgets.QWidget()
            layout = QtWidgets.QVBoxLayout(central)

            # --- control panel ---------------------------------------- #
            controls = QtWidgets.QHBoxLayout()
            self.play_btn = QtWidgets.QPushButton("Play")
            self.play_btn.clicked.connect(self.toggle_play)
            controls.addWidget(self.play_btn)
            self.slider = QtWidgets.QSlider(QtCore.Qt.Orientation.Horizontal)
            self.slider.setMaximum(max(controller.dataset_model.num_frames - 1, 0))
            self.slider.valueChanged.connect(self.seek)
            controls.addWidget(self.slider)
            self.db_box = QtWidgets.QCheckBox("dB")
            self.db_box.setChecked(True)
            self.db_box.stateChanged.connect(self.toggle_db)
            controls.addWidget(self.db_box)
            export_btn = QtWidgets.QPushButton("Export Movie")
            export_btn.clicked.connect(self.export_movie)
            controls.addWidget(export_btn)
            layout.addLayout(controls)

            # --- 2x2 view grid ----------------------------------------- #
            grid = QtWidgets.QGridLayout()
            self.views = {}
            for i, key in enumerate(view_keys):
                fig = Figure(figsize=(5, 4))
                canvas = FigureCanvasQTAgg(fig)
                ax = fig.add_subplot(111)
                spec = controller.registry[key]
                self.views[key] = (VIEW_CLASSES[spec.view_name](ax=ax), canvas)
                grid.addWidget(canvas, i // 2, i % 2)
            layout.addLayout(grid)
            self.setCentralWidget(central)

            controller.subscribe_view_update(self.on_view_update)
            self.timer = QtCore.QTimer()
            self.timer.setInterval(interval_ms)
            self.timer.timeout.connect(self.tick)
            self.playing = False
            self.frame = 0

        def on_view_update(self, key, payload):
            if key in self.views:
                view, canvas = self.views[key]
                view.set_data(payload)
                canvas.draw_idle()

        def tick(self):
            if self.frame >= controller.dataset_model.num_frames:
                self.toggle_play()
                return
            controller.process_next_frame(self.frame)
            self.slider.blockSignals(True)
            self.slider.setValue(self.frame)
            self.slider.blockSignals(False)
            self.frame += 1

        def toggle_play(self):
            self.playing = not self.playing
            self.play_btn.setText("Pause" if self.playing else "Play")
            (self.timer.start if self.playing else self.timer.stop)()

        def seek(self, idx):
            self.frame = idx
            controller.process_next_frame(idx)

        def toggle_db(self, state):
            enabled = bool(state)
            for view, canvas in self.views.values():
                view.set_db_mode(enabled)
                canvas.draw_idle()

        def export_movie(self):
            path, _ = QtWidgets.QFileDialog.getSaveFileName(
                self, "Export Dataset Movie", "movie.mp4"
            )
            if path:
                from mmwave_radar_processing_tpu.visualization.video_exporter import (
                    VideoExporter,
                )

                VideoExporter(controller, view_keys=list(self.views)).export(path)

    app = QtWidgets.QApplication.instance() or QtWidgets.QApplication([])
    win = MainWindow()
    win.resize(1200, 900)
    win.show()
    app.exec()
