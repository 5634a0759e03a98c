"""Mesh / connectivity visualization (dev aid).

Reference parity: ``plot_connectivity`` (global_curved.jl:960-984) and
``plot_blocks`` (:986-1029).  Two backends: a dependency-free terminal
renderer (Braille-style dot canvas, mirroring the reference's
UnicodePlots output) and matplotlib (optional, for files).
"""
import numpy as np

from . import BC_DIRICHLET, BC_LOCKED_INTERFACE, BC_NEUMANN


class DotCanvas:
    """Minimal Braille-dot terminal canvas (2x4 dots per character)."""

    def __init__(self, width_ch=80, height_ch=24, xlim=(0, 1), ylim=(0, 1)):
        self.W, self.H = width_ch, height_ch
        self.xlim, self.ylim = xlim, ylim
        self.dots = np.zeros((height_ch * 4, width_ch * 2), dtype=bool)

    def _to_px(self, x, y):
        (x0, x1), (y0, y1) = self.xlim, self.ylim
        px = (np.asarray(x) - x0) / max(x1 - x0, 1e-300) * (self.W * 2 - 1)
        py = (1 - (np.asarray(y) - y0) / max(y1 - y0, 1e-300)) * (self.H * 4 - 1)
        return px, py

    def line(self, x0, y0, x1, y1):
        n = 2 * max(self.W, self.H) * 4
        xs = np.linspace(x0, x1, n)
        ys = np.linspace(y0, y1, n)
        px, py = self._to_px(xs, ys)
        ok = (px >= 0) & (px < self.W * 2) & (py >= 0) & (py < self.H * 4)
        self.dots[py[ok].astype(int), px[ok].astype(int)] = True

    def polyline(self, xs, ys):
        for i in range(len(xs) - 1):
            self.line(xs[i], ys[i], xs[i + 1], ys[i + 1])

    def render(self):
        # Braille cell dot bit layout
        bits = np.array([[0x01, 0x08], [0x02, 0x10], [0x04, 0x20],
                         [0x40, 0x80]])
        rows = []
        for cy in range(self.H):
            row = []
            for cx in range(self.W):
                cell = self.dots[cy * 4:(cy + 1) * 4, cx * 2:(cx + 1) * 2]
                code = int((cell * bits).sum())
                row.append(chr(0x2800 + code))
            rows.append("".join(row))
        return "\n".join(rows)


def _bounds(xs, ys, margin=0.02):
    x0, x1 = float(np.min(xs)), float(np.max(xs))
    y0, y1 = float(np.min(ys)), float(np.max(ys))
    dx, dy = max(x1 - x0, 1e-9), max(y1 - y0, 1e-9)
    return (x0 - margin * dx, x1 + margin * dx), (y0 - margin * dy,
                                                  y1 + margin * dy)


def plot_connectivity(verts, EToV, *, width=80, height=24, file=None):
    """Render element outlines; returns the text rendering (and prints it
    unless ``file`` is given, in which case matplotlib writes a figure)."""
    xlim, ylim = _bounds(verts[0], verts[1])
    cv = DotCanvas(width, height, xlim, ylim)
    for e in range(EToV.shape[1]):
        v1, v2, v3, v4 = EToV[:, e]
        xs = verts[0, [v1, v2, v4, v3, v1]]
        ys = verts[1, [v1, v2, v4, v3, v1]]
        cv.polyline(xs, ys)
    text = cv.render()
    if file:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        for e in range(EToV.shape[1]):
            v1, v2, v3, v4 = EToV[:, e]
            ax.plot(verts[0, [v1, v2, v4, v3, v1]],
                    verts[1, [v1, v2, v4, v3, v1]], "k-", lw=0.7)
        ax.set_aspect("equal")
        ax.set_title("connectivity")
        fig.savefig(file, dpi=130)
    else:
        print(text)
    return text


_BC_STYLE = {BC_LOCKED_INTERFACE: ("b", "locked"),
             BC_DIRICHLET: ("g", "dirichlet"),
             BC_NEUMANN: ("y", "neumann")}


def plot_blocks(lops, *, width=80, height=24, file=None):
    """Render the (possibly curved) block faces colored by bc type."""
    xs_all = np.concatenate([np.asarray(lops[e].coord[0]).ravel()
                             for e in range(len(lops))])
    ys_all = np.concatenate([np.asarray(lops[e].coord[1]).ravel()
                             for e in range(len(lops))])
    xlim, ylim = _bounds(xs_all, ys_all)
    cv = DotCanvas(width, height, xlim, ylim)
    segments = []
    for e in range(len(lops)):
        lop = lops[e]
        xf, yf = lop.facecoord
        for lf in range(4):
            cv.polyline(np.asarray(xf[lf]), np.asarray(yf[lf]))
            code = lop.bctype[lf]
            color = _BC_STYLE.get(code, ("r", "fault"))[0]
            segments.append((np.asarray(xf[lf]), np.asarray(yf[lf]), color))
    text = cv.render()
    if file:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        for xs, ys, c in segments:
            ax.plot(xs, ys, c, lw=0.8)
        ax.set_aspect("equal")
        ax.set_title("mesh blocks (b=locked g=dirichlet y=neumann r=fault)")
        fig.savefig(file, dpi=130)
    else:
        print(text)
    return text
