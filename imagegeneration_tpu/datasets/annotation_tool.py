"""Image annotation tool: session core + headless CLI (+ optional PyQt GUI).

Counterpart of dataset_creator/preprocess_scripts/pyqt_image_annotation_tool/
main.py (a vendored third-party PyQt5 GUI, SURVEY.md §2 #30). Capabilities
reproduced:

- label a folder of images with user-defined labels (the landscape dataset
  used the 10-label schema in datasets/labels.py);
- three modes (main.py:54,161-178): 'csv' (write a one-hot CSV), 'copy'
  (copy each image into a per-label folder), 'move' (move instead of copy);
- navigation next/prev, label assignment/toggling per image, CSV generated
  automatically at the end (main.py:299-687 behaviors);
- one-hot CSV layout: header 'img,<label...>' + 0/1 rows — the same shape the
  reference preprocess scripts consume (without the header).

The session logic (`AnnotationSession`) is pure and unit-tested. `--gui`
launches the graphical labeler in datasets/annotation_gui.py (PyQt5 when
installed, tkinter otherwise — both reproduce the reference window's image
panel, label buttons, and n/p/1-9 shortcuts). The terminal UI reads the
same commands and renders the current image as ANSI half-block art so
labeling without a display is actually possible.
"""

from __future__ import annotations

import argparse
import csv
import os
import shutil
from pathlib import Path

IMG_EXTENSIONS = (".jpg", ".png", ".jpeg")


def get_img_paths(directory: str | Path, extensions=IMG_EXTENSIONS) -> list[str]:
    return sorted(
        str(Path(directory) / f)
        for f in os.listdir(directory)
        if f.lower().endswith(tuple(extensions))
    )


class AnnotationSession:
    """Label assignment state machine for one image folder."""

    def __init__(
        self, input_folder: str | Path, labels: list[str], mode: str = "csv"
    ) -> None:
        if mode not in ("csv", "copy", "move"):
            raise ValueError(f"unknown mode {mode!r}")
        if not labels:
            raise ValueError("at least one label required")
        self.input_folder = Path(input_folder)
        self.labels = list(labels)
        self.mode = mode
        self.images = get_img_paths(input_folder)
        if not self.images:
            raise FileNotFoundError(f"no images in {input_folder}")
        self.index = 0
        # image path -> set of assigned labels (multi-label, like the GUI)
        self.assigned: dict[str, set[str]] = {p: set() for p in self.images}

    # ------------------------------------------------------------ navigation
    @property
    def current(self) -> str:
        return self.images[self.index]

    def next(self) -> str:
        self.index = min(self.index + 1, len(self.images) - 1)
        return self.current

    def prev(self) -> str:
        self.index = max(self.index - 1, 0)
        return self.current

    # ------------------------------------------------------------- labeling
    def toggle_label(self, label_or_index: str | int) -> set[str]:
        """Assign/unassign a label on the current image (GUI keys 1-9)."""
        if isinstance(label_or_index, int):
            if not 0 <= label_or_index < len(self.labels):
                raise IndexError(f"label index {label_or_index} out of range")
            label = self.labels[label_or_index]
        else:
            if label_or_index not in self.labels:
                raise KeyError(f"unknown label {label_or_index!r}")
            label = label_or_index
        s = self.assigned[self.current]
        if label in s:
            s.remove(label)
        else:
            s.add(label)
        return set(s)

    # --------------------------------------------------------------- output
    def to_rows(self) -> list[list]:
        rows = []
        for p in self.images:
            onehot = [1 if lb in self.assigned[p] else 0 for lb in self.labels]
            rows.append([os.path.basename(p), *onehot])
        return rows

    def write_csv(self, out_path: str | Path, header: bool = True) -> None:
        out_path = Path(out_path)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        with open(out_path, "w", newline="") as f:
            w = csv.writer(f)
            if header:
                w.writerow(["img", *self.labels])
            w.writerows(self.to_rows())

    def apply_copy_move(self, output_folder: str | Path) -> int:
        """'copy'/'move' modes: file each image into per-label subfolders."""
        if self.mode == "csv":
            return 0
        out = Path(output_folder)
        n = 0
        for p in self.images:
            for label in self.assigned[p]:
                dest_dir = out / label
                dest_dir.mkdir(parents=True, exist_ok=True)
                dest = dest_dir / os.path.basename(p)
                if self.mode == "copy":
                    shutil.copyfile(p, dest)
                else:
                    shutil.move(p, dest)
                n += 1
        return n


def render_image_ansi(path: str | Path, max_width: int = 72) -> str:
    """Render an image as ANSI truecolor half-block art for the terminal UI.

    Each character cell shows two vertical pixels (upper-half-block glyph
    with fg = top pixel, bg = bottom pixel), so the terminal labeler can
    actually DISPLAY the image being labeled — the capability the
    reference's GUI provides via QPixmap (main.py:571-591). Any truecolor
    terminal (all modern ones) renders it; failures (unreadable file,
    missing PIL) degrade to a placeholder line rather than crashing the
    labeling session.
    """
    try:
        from PIL import Image

        with Image.open(path) as im:
            img = im.convert("RGB")
            scale = min(max_width / img.width, 1.0)
            # terminal cells are ~2x taller than wide; half-blocks give 2
            # vertical pixels per cell, so width scaling alone keeps aspect
            w = max(int(img.width * scale), 1)
            h = max(int(img.height * scale), 2) // 2 * 2
            img = img.resize((w, h))
            px = img.load()
        lines = []
        for y in range(0, h, 2):
            cells = []
            for x in range(w):
                tr, tg, tb = px[x, y]
                br, bg_, bb = px[x, y + 1]
                cells.append(
                    f"\x1b[38;2;{tr};{tg};{tb}m\x1b[48;2;{br};{bg_};{bb}m▀"
                )
            lines.append("".join(cells) + "\x1b[0m")
        return "\n".join(lines)
    except Exception as e:  # noqa: BLE001 — preview must never kill the UI
        return f"[no preview: {e}]"


def run_terminal_ui(
    session: AnnotationSession, csv_out: str | Path, preview: bool = True
) -> None:
    """Minimal stdin labeler: n(ext) p(rev) 1-9 toggle label, q(uit+save)."""
    print(f"Labels: {[f'{i + 1}:{lb}' for i, lb in enumerate(session.labels)]}")
    print("Commands: 1-9 toggle label, n next, p prev, q quit (auto-saves csv)")
    while True:
        cur = session.current
        if preview:
            print(render_image_ansi(cur))
        print(
            f"[{session.index + 1}/{len(session.images)}] "
            f"{os.path.basename(cur)} -> {sorted(session.assigned[cur])}"
        )
        try:
            cmd = input("> ").strip().lower()
        except EOFError:
            break
        if cmd == "q":
            break
        elif cmd == "n":
            session.next()
        elif cmd == "p":
            session.prev()
        elif cmd.isdigit() and cmd != "0":
            try:
                session.toggle_label(int(cmd) - 1)
            except IndexError:
                print("no such label")
        elif cmd:
            print("unknown command")
    session.write_csv(csv_out)
    print(f"CSV written to {csv_out}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Image annotation tool")
    parser.add_argument("input_folder", nargs="?", default=None,
                        help="image folder; omit (with --gui) to configure "
                             "interactively via the graphical setup form, "
                             "like the reference's SetupWindow")
    parser.add_argument(
        "--labels", default=None,
        help="comma-separated label names (e.g. the 10-label landscape "
             "schema); required unless the setup form is used",
    )
    parser.add_argument("--mode", choices=["csv", "copy", "move"], default="csv")
    parser.add_argument("--csv-out", default=None)
    parser.add_argument("--output-folder", default=None,
                        help="destination for copy/move modes")
    parser.add_argument("--gui", action="store_true", default=False,
                        help="open the graphical labeler (PyQt5 if "
                             "installed, else tkinter)")
    parser.add_argument("--no-preview", action="store_true", default=False,
                        help="terminal UI: skip the ANSI image preview")
    args = parser.parse_args(argv)

    if args.input_folder is None or args.labels is None:
        # Interactive setup (reference SetupWindow flow, main.py:40-296):
        # folder browse + mode radios + label fields, then the labeler.
        if not args.gui:
            parser.error(
                "input_folder and --labels are required without --gui "
                "(pass --gui alone to configure via the setup form)"
            )
        from imagegeneration_tpu.datasets.annotation_gui import run_setup_gui

        if not run_setup_gui():
            parser.error(
                "no GUI toolkit/display available for the setup form; "
                "pass input_folder and --labels instead"
            )
        return

    labels = [s.strip() for s in args.labels.split(",") if s.strip()]
    session = AnnotationSession(args.input_folder, labels, args.mode)
    csv_out = args.csv_out or os.path.join(args.input_folder, "labels.csv")

    if args.gui:
        from imagegeneration_tpu.datasets.annotation_gui import run_gui

        if run_gui(session, csv_out, args.output_folder):
            return  # the GUI handles csv + copy/move on close
        print("Falling back to the terminal UI.")
    run_terminal_ui(session, csv_out, preview=not args.no_preview)
    if args.mode in ("copy", "move"):
        dest = args.output_folder or args.input_folder
        n = session.apply_copy_move(dest)
        print(f"{args.mode}d {n} files into per-label folders under {dest}")


if __name__ == "__main__":
    main()
