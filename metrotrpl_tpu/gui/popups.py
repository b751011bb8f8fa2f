"""Dialog popups (reference GUI/popup.py, quicksim_entry_popup.py,
quicksim_result_popup.py, activate_chain_popup.py equivalents)."""

import numpy as np

from metrotrpl_tpu.gui.plots import sim_plot
from metrotrpl_tpu.gui.quicksim import QuicksimManager, QuicksimTask

# the reference's quicksim "external variables"
# (GUI/quicksim_entry_popup.py keybind set)
EXT_VARS = ("thickness", "nx", "final_time", "nt", "fluence", "absp",
            "direction")
EXT_DEFAULTS = {"thickness": 311, "nx": 128, "final_time": 2000, "nt": 500,
                "fluence": 2.12e11, "absp": 6e4, "direction": 1}


class Popup:
    """Base modal popup."""

    def __init__(self, parent, title):
        import tkinter as tk

        from metrotrpl_tpu.gui.styles import LIGHT_GREY

        self.tk = tk
        self.parent = parent
        self.top = tk.Toplevel(parent.root)
        self.top.title(title)
        # standard popup background (reference GUI/popup.py:15)
        self.top.configure(background=LIGHT_GREY)


def save_ext_vars(values, path):
    """Persist quicksim external variables to a keybind-style text file
    (reference quicksim_entry_popup.py:264-313 save/load feature)."""
    with open(path, "w") as f:
        for name in EXT_VARS:
            f.write(f"{name}: {values[name]}\n")


def load_ext_vars(path):
    values = dict(EXT_DEFAULTS)
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            k = k.strip()
            if k in values:
                values[k] = float(v.strip())
    return values


class QuicksimEntryPopup(Popup):
    """Collect external sim variables and launch the quicksim process
    against the mean posterior state of each selected chain."""

    def __init__(self, parent):
        super().__init__(parent, "Quicksim")
        tk = self.tk
        self.vars = {}
        for i, name in enumerate(EXT_VARS):
            tk.Label(self.top, text=name).grid(row=i, column=0, sticky="w")
            v = tk.StringVar(value=str(EXT_DEFAULTS[name]))
            tk.Entry(self.top, textvariable=v).grid(row=i, column=1)
            self.vars[name] = v
        row = len(EXT_VARS)
        tk.Button(self.top, text="Simulate",
                  command=self.launch).grid(row=row, column=0)
        tk.Button(self.top, text="Save...",
                  command=self.save_settings).grid(row=row, column=1)
        tk.Button(self.top, text="Load...",
                  command=self.load_settings).grid(row=row + 1, column=1)

    def save_settings(self):
        from tkinter import filedialog
        path = filedialog.asksaveasfilename(defaultextension=".txt")
        if path:
            save_ext_vars({k: v.get() for k, v in self.vars.items()}, path)

    def load_settings(self):
        from tkinter import filedialog
        path = filedialog.askopenfilename()
        if path:
            for k, v in load_ext_vars(path).items():
                self.vars[k].set(str(v))

    def build_tasks(self, burn=0):
        if self.parent.meta is None:
            raise RuntimeError(
                "Load an output file before running quicksim")
        ext = {k: float(v.get()) for k, v in self.vars.items()}
        # Re-simulate with the MODEL the posterior was fit with (a traps
        # run silently re-simulated as std would ignore kC/Nt/tauE)
        ef = self.parent.meta["ensemble"].ensemble_fields
        model = ef.get("model", "std")
        tasks = []
        for c in self.parent._selected_chains():
            params = {
                p: float(np.mean(np.asarray(c.data[p])[burn:]))
                for p in self.parent.meta["names"] if not p.startswith("_")}
            tasks.append(QuicksimTask(
                thickness=ext["thickness"], nx=int(ext["nx"]),
                final_time=ext["final_time"], nt=int(ext["nt"]),
                fluence=ext["fluence"], absp=ext["absp"],
                direction=ext["direction"], params=params, model=model))
        return tasks

    def _run_units(self):
        """The run's own unit-conversion table (ensemble_fields['units']),
        not the default staub vocabulary."""
        ef = self.parent.meta["ensemble"].ensemble_fields
        names = self.parent.meta["names"]
        units = ef.get("units")
        if units is None:
            return None
        return {n: float(u) for n, u in zip(names, units)}

    def launch(self):
        burn = int(float(self.parent.burn_var.get() or 0))
        tasks = self.build_tasks(burn)
        qs = QuicksimManager()
        qs.simulate(tasks, units=self._run_units())
        QuicksimResultPopup(self.parent, qs, tasks)
        self.top.destroy()


class QuicksimResultPopup(Popup):
    """Poll the quicksim queue with tk.after and overlay results
    (reference GUI/window.py:171-208 poll pattern), with per-sim scale
    factors (quicksim_result_popup.py:141-183)."""

    def __init__(self, parent, qs, tasks):
        super().__init__(parent, "Quicksim results")
        from matplotlib.backends.backend_tkagg import FigureCanvasTkAgg
        from matplotlib.figure import Figure

        tk = self.tk
        self.qs = qs
        self.tasks = tasks
        self.results = []
        self.fig = Figure(figsize=(6, 5), dpi=100)
        self.ax = self.fig.add_subplot(111)
        self.canvas = FigureCanvasTkAgg(self.fig, master=self.top)
        self.canvas.get_tk_widget().pack(fill=tk.BOTH, expand=True)
        self.scale_var = tk.StringVar(value="1.0")
        row = tk.Frame(self.top)
        row.pack()
        tk.Label(row, text="scale factor").pack(side=tk.LEFT)
        tk.Entry(row, textvariable=self.scale_var,
                 width=10).pack(side=tk.LEFT)
        tk.Button(row, text="redraw", command=self.redraw).pack(side=tk.LEFT)
        self.top.after(500, self.poll)

    def poll(self):
        items, done = self.qs.poll()
        for idx, t, s, msg in items:
            if idx >= 0:
                self.results.append((idx, t, s))
            else:
                print(msg)
        if items:
            self.redraw()
        if not done:
            self.top.after(500, self.poll)
        else:
            self.qs.join()

    def redraw(self):
        self.ax.clear()
        try:
            scale = float(self.scale_var.get())
        except ValueError:
            scale = 1.0
        for idx, t, s in self.results:
            sim_plot(self.ax, t, s * scale, label=f"sim {idx}")
        self.canvas.draw()


class ActivateChainPopup(Popup):
    """Toggle which chains are plotted (reference
    activate_chain_popup.py)."""

    def __init__(self, parent):
        super().__init__(parent, "Chains")
        tk = self.tk
        self.flags = []
        for i, c in enumerate(parent.chains):
            v = tk.IntVar(value=1)
            tk.Checkbutton(self.top, text=c.label, variable=v).pack(
                anchor="w")
            self.flags.append(v)
        tk.Button(self.top, text="Apply", command=self.apply).pack()

    def apply(self):
        lb = self.parent.chain_list
        lb.selection_clear(0, self.tk.END)
        for i, v in enumerate(self.flags):
            if v.get():
                lb.selection_set(i)
        self.top.destroy()
