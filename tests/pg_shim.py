"""Headless fake-``pyqtgraph`` shim so the Pg render tier EXECUTES in CI.

No Qt binding ships in this container, yet
``visualization/pyqtgraph_views.py`` carries real rendering math (dB
conversion, [y, x] -> [x, y] transposes, ``setRect`` physical extents,
velocity->LUT coloring) — exactly the class of code the round-2 colorbar
bug lived in.  This shim installs minimal recording doubles for
``pyqtgraph``, ``pyqtgraph.Qt`` and ``pyqtgraph.opengl`` into
``sys.modules`` so every Pg view class runs headless and tests can assert
the arrays/extents/levels that would have been handed to the GPU.

Only the surface the views actually touch is faked; every recorded call
keeps the exact arguments (no normalization) so assertions compare against
the matplotlib tier's math, not against the shim's interpretation.
"""

from __future__ import annotations

import sys
import types

import numpy as np


class FakeQRectF:
    def __init__(self, x, y, w, h):
        self._x, self._y, self._w, self._h = (float(x), float(y),
                                              float(w), float(h))

    def x(self):
        return self._x

    def y(self):
        return self._y

    def width(self):
        return self._w

    def height(self):
        return self._h

    def __repr__(self):
        return f"FakeQRectF({self._x}, {self._y}, {self._w}, {self._h})"


class FakePen:
    def __init__(self, *args, **kwargs):
        self.args, self.kwargs = args, kwargs


class FakeAxis:
    def __init__(self):
        self.label = None

    def setLabel(self, text=None, **_):
        self.label = text


class FakeImageItem:
    def __init__(self):
        self.image = None
        self.auto_levels = None
        self.rect = None
        self.lut = None

    def setImage(self, image=None, autoLevels=None, **_):
        self.image = None if image is None else np.asarray(image)
        self.auto_levels = autoLevels

    def setRect(self, rect):
        self.rect = rect

    def setLookupTable(self, lut):
        self.lut = np.asarray(lut)


class FakePlotDataItem:
    def __init__(self, *args, **kwargs):
        self.args, self.kwargs = args, kwargs
        self.x = self.y = None

    def setData(self, x=None, y=None, **_):
        self.x = None if x is None else np.asarray(x)
        self.y = None if y is None else np.asarray(y)


class FakeScatterPlotItem:
    def __init__(self, *args, **kwargs):
        self.args, self.kwargs = args, kwargs
        self.x = self.y = None

    def setData(self, x=None, y=None, **_):
        self.x = None if x is None else np.asarray(x)
        self.y = None if y is None else np.asarray(y)


class FakeInfiniteLine:
    def __init__(self, *args, **kwargs):
        self.args, self.kwargs = args, kwargs
        self.value = None

    def setValue(self, v):
        self.value = float(v)


class _PlotSurface:
    """Shared recording surface for PlotWidget and GraphicsLayout plots."""

    def __init__(self):
        self.items = []
        self.labels = {}
        self.title = None
        self.hidden_axes = []
        self.shown_axes = []
        self._axes = {}
        self.y_range = None
        self.mouse_enabled = None

    def addItem(self, item):
        self.items.append(item)

    def setLabel(self, pos, text=None, **_):
        self.labels[pos] = text

    def setTitle(self, title=None, **_):
        self.title = title

    def plot(self, *args, **kwargs):
        item = FakePlotDataItem(*args, **kwargs)
        self.items.append(item)
        return item

    def hideAxis(self, name):
        self.hidden_axes.append(name)

    def showAxis(self, name):
        self.shown_axes.append(name)

    def getAxis(self, name):
        return self._axes.setdefault(name, FakeAxis())

    def setYRange(self, lo, hi, padding=None):
        self.y_range = (float(lo), float(hi))

    def setMouseEnabled(self, x=None, y=None):
        self.mouse_enabled = (x, y)


class FakeQWidget:
    def __init__(self, parent=None, *args, **kwargs):
        self.parent = parent
        self._fixed_width = None

    def setFixedWidth(self, w):
        self._fixed_width = w


class FakePlotWidget(FakeQWidget, _PlotSurface):
    def __init__(self, *args, **kwargs):
        FakeQWidget.__init__(self)
        _PlotSurface.__init__(self)


class FakeGraphicsLayoutWidget(FakeQWidget):
    def __init__(self, *args, **kwargs):
        super().__init__()
        self.plots = []

    def addPlot(self, *args, **kwargs):
        p = _PlotSurface()
        self.plots.append(p)
        return p


class FakeBoxLayout:
    def __init__(self, widget=None):
        self.widget = widget
        self.added = []

    def addWidget(self, w, stretch=0, **_):
        self.added.append((w, stretch))


class FakeGLViewWidget(FakeQWidget):
    def __init__(self, *args, **kwargs):
        super().__init__()
        self.items = []
        self.camera = None

    def addItem(self, item):
        self.items.append(item)

    def setCameraPosition(self, **kwargs):
        self.camera = kwargs


class FakeGLGridItem:
    def __init__(self, *args, **kwargs):
        pass


class FakeGLScatterPlotItem:
    def __init__(self, pos=None, color=None, size=None, pxMode=None, **_):
        self.pos = None if pos is None else np.asarray(pos)
        self.color = color
        self.size = size
        self.px_mode = pxMode

    def setData(self, pos=None, color=None, size=None, **_):
        if pos is not None:
            self.pos = np.asarray(pos)
        if color is not None:
            self.color = np.asarray(color)
        if size is not None:
            self.size = size


class _FakeColormap:
    def __init__(self, name):
        from matplotlib import pyplot as plt

        self._lut = (plt.get_cmap(name)(np.linspace(0, 1, 256))[:, :3]
                     * 255).astype(np.uint8)

    def getLookupTable(self, *args, **kwargs):
        return self._lut


def install(monkeypatch):
    """Install the fake module tree; returns the fake ``pyqtgraph`` module.

    Uses ``monkeypatch.setitem`` so the real module table is restored after
    each test — ``pyqtgraph_available()`` must stay honest elsewhere.
    """
    pg = types.ModuleType("pyqtgraph")
    pg.PlotWidget = FakePlotWidget
    pg.ImageItem = FakeImageItem
    pg.ScatterPlotItem = FakeScatterPlotItem
    pg.InfiniteLine = FakeInfiniteLine
    pg.GraphicsLayoutWidget = FakeGraphicsLayoutWidget
    pg.mkPen = lambda *a, **k: FakePen(*a, **k)
    pg.mkBrush = lambda *a, **k: FakePen(*a, **k)
    pg.colormap = types.SimpleNamespace(get=_FakeColormap)

    qt = types.ModuleType("pyqtgraph.Qt")
    pen_style = types.SimpleNamespace(DashLine="dash", SolidLine="solid")
    qt.QtCore = types.SimpleNamespace(
        QRectF=FakeQRectF, Qt=types.SimpleNamespace(PenStyle=pen_style))
    qt.QtWidgets = types.SimpleNamespace(
        QWidget=FakeQWidget, QVBoxLayout=FakeBoxLayout,
        QHBoxLayout=FakeBoxLayout)
    pg.Qt = qt

    gl = types.ModuleType("pyqtgraph.opengl")
    gl.GLViewWidget = FakeGLViewWidget
    gl.GLGridItem = FakeGLGridItem
    gl.GLScatterPlotItem = FakeGLScatterPlotItem
    pg.opengl = gl

    monkeypatch.setitem(sys.modules, "pyqtgraph", pg)
    monkeypatch.setitem(sys.modules, "pyqtgraph.Qt", qt)
    monkeypatch.setitem(sys.modules, "pyqtgraph.opengl", gl)
    return pg
