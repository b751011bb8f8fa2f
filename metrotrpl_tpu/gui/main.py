"""GUI entry point: ``python -m metrotrpl_tpu.gui.main [pickles...]``
(reference GUI/main.py equivalent)."""

import sys


def main(argv=None):
    from metrotrpl_tpu.gui.window import Window

    argv = sys.argv[1:] if argv is None else argv
    win = Window(1100, 800)
    for fname in argv:
        win.loadfile(fname)
    win.mainloop()


if __name__ == "__main__":
    main()
