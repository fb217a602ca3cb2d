"""Graphical image labeler: PyQt5 window + tkinter fallback.

Counterpart of the reference's vendored PyQt5 annotation GUI
(dataset_creator/preprocess_scripts/pyqt_image_annotation_tool/main.py,
`LabelerWindow` at :299-687). Feature parity:

- image panel displaying the current image, scaled to fit (main.py:571-591);
- Prev/Next buttons with `p`/`n` keyboard shortcuts (main.py:403-418);
- one button per label with `1`-`9` keyboard shortcuts; clicking/pressing
  toggles the label on the current image (main.py:426-519);
- assigned-label buttons highlighted green (main.py:640-655);
- "automatically show next image when labeled" checkbox (main.py:333,516);
- "Generate csv" button writing the one-hot sheet, with an optional
  "Also generate .xlsx file" checkbox (main.py:593-638 — xlsx via the
  stdlib writer in datasets/xlsx.py since xlsxwriter is not in this image);
- csv auto-generated on window close (main.py:657-663);
- csv/copy/move modes via the shared `AnnotationSession` (applied at save
  time rather than per-click: same final file layout as the reference's
  incremental copy/move in main.py:449-519, without its mid-session
  moved-file bookkeeping).

Design: the Qt window class is produced by `make_labeler_window(qt)`, a
factory over an injected toolkit namespace. Production injects real PyQt5
(`load_pyqt5()`); tests inject a fake implementing the same small widget
API, so the full window logic is exercised on hosts without Qt or a
display (this image has neither). A tkinter fallback (`run_tk_gui`) gives
a working GUI on stock Python installs where PyQt5 is absent.
"""

from __future__ import annotations

import os
from pathlib import Path
from types import SimpleNamespace

from imagegeneration_tpu.datasets.annotation_tool import AnnotationSession
from imagegeneration_tpu.datasets.xlsx import csv_to_xlsx

GREEN_BUTTON_STYLE = (
    "border: 1px solid #43A047; background-color: #4CAF50; color: white"
)


def load_stylesheet() -> str:
    """Window stylesheet, mirroring the reference's styles.qss mechanism
    (main.py:142-148 loads "./styles.qss" and falls back with a print).
    Resolution order: ./styles.qss in the working directory (the reference
    contract, so users can retheme without touching the package), then the
    packaged datasets/styles.qss (our own theme, not the reference asset),
    then empty."""
    for candidate in (Path("styles.qss"), Path(__file__).with_name("styles.qss")):
        try:
            return candidate.read_text()
        except OSError:
            continue
    print("Can't load custom stylesheet.")
    return ""


def load_pyqt5() -> SimpleNamespace:
    """Import PyQt5 and return the widget-API namespace the windows use.

    Raises ImportError when PyQt5 is absent (it is not baked into this
    image) — callers fall back to tkinter or the terminal UI.
    """
    from PyQt5 import QtWidgets
    from PyQt5.QtCore import Qt
    from PyQt5.QtGui import QIntValidator, QKeySequence, QPixmap
    from PyQt5.QtWidgets import (
        QApplication,
        QCheckBox,
        QFileDialog,
        QLabel,
        QLineEdit,
        QRadioButton,
        QShortcut,
        QWidget,
    )

    return SimpleNamespace(
        QtWidgets=QtWidgets,
        Qt=Qt,
        QApplication=QApplication,
        QWidget=QWidget,
        QLabel=QLabel,
        QCheckBox=QCheckBox,
        QShortcut=QShortcut,
        QKeySequence=QKeySequence,
        QPixmap=QPixmap,
        QLineEdit=QLineEdit,
        QRadioButton=QRadioButton,
        QFileDialog=QFileDialog,
        QIntValidator=QIntValidator,
    )


def make_labeler_window(qt: SimpleNamespace) -> type:
    """Build the LabelerWindow class against the injected toolkit `qt`."""

    class LabelerWindow(qt.QWidget):
        """Reference-equivalent labeling window over an AnnotationSession."""

        IMG_PANEL = 1024  # square panel, main.py:309-311

        def __init__(
            self,
            session: AnnotationSession,
            csv_out: str | Path | None = None,
            output_folder: str | Path | None = None,
        ) -> None:
            super().__init__()
            self.session = session
            self.csv_out = Path(
                csv_out
                or Path(session.input_folder) / "output" / "assigned_classes.csv"
            )
            self.output_folder = Path(output_folder or session.input_folder)
            self._saved_on_close = False

            self.image_box = qt.QLabel(self)
            self.img_name_label = qt.QLabel(self)
            self.progress_bar = qt.QLabel(self)
            self.curr_image_headline = qt.QLabel("Current image", self)
            self.csv_generated_message = qt.QLabel(self)
            self.show_next_checkbox = qt.QCheckBox(
                "Automatically show next image when labeled", self
            )
            self.generate_xlsx_checkbox = qt.QCheckBox(
                "Also generate .xlsx file", self
            )
            self.label_buttons: list = []
            self._init_ui()

        # ------------------------------------------------------------- UI
        def _init_ui(self) -> None:
            self.setWindowTitle(
                "imagegeneration_tpu - Annotation tool "
                "for assigning image classes"
            )
            self.setMinimumSize(1100, 770)
            self.setStyleSheet(load_stylesheet())
            panel = self.IMG_PANEL

            prev_btn = qt.QtWidgets.QPushButton("Prev", self)
            prev_btn.move(panel + 20, 50)
            prev_btn.clicked.connect(self.show_prev_image)
            next_btn = qt.QtWidgets.QPushButton("Next", self)
            next_btn.move(panel + 140, 50)
            next_btn.clicked.connect(self.show_next_image)
            qt.QShortcut(qt.QKeySequence("p"), self).activated.connect(
                self.show_prev_image
            )
            qt.QShortcut(qt.QKeySequence("n"), self).activated.connect(
                self.show_next_image
            )

            csv_btn = qt.QtWidgets.QPushButton("Generate csv", self)
            csv_btn.move(panel + 20, 600)
            csv_btn.clicked.connect(self.generate_csv)

            # one button per label, columns of 10, shortcuts 1..9
            # (main.py:426-447: ">9 labels start overwriting shortcuts")
            x_shift = 0
            for i, label in enumerate(self.session.labels):
                button = qt.QtWidgets.QPushButton(label, self)
                self.label_buttons.append(button)
                button.clicked.connect(
                    lambda *a, x=label: self.toggle_label(x)
                )
                qt.QShortcut(
                    qt.QKeySequence(str((i + 1) % 10)), self
                ).activated.connect(lambda x=label: self.toggle_label(x))
                y_shift = 40 * (i % 10)
                if i != 0 and i % 10 == 0:
                    x_shift += 120
                    y_shift = 0
                button.move(panel + 20 + x_shift, y_shift + 120)

            self.show_next_checkbox.setChecked(False)
            self.show_next_checkbox.setGeometry(panel + 20, 10, 400, 20)
            self.generate_xlsx_checkbox.setChecked(False)
            self.generate_xlsx_checkbox.setGeometry(panel + 140, 606, 300, 20)
            self.curr_image_headline.setGeometry(20, 10, 300, 20)
            self.img_name_label.setGeometry(20, 40, panel, 20)
            self.progress_bar.setGeometry(20, 65, panel, 20)
            self.csv_generated_message.setGeometry(panel + 20, 660, 800, 20)
            self.image_box.setGeometry(20, 120, panel, panel)
            self.image_box.setAlignment(qt.Qt.AlignTop)
            self._refresh()

        # ------------------------------------------------------ interaction
        def toggle_label(self, label: str) -> None:
            self.session.toggle_label(label)
            if self.show_next_checkbox.isChecked():
                self.show_next_image()
            else:
                self._refresh_buttons()

        def show_next_image(self) -> None:
            self.session.next()
            self._refresh()

        def show_prev_image(self) -> None:
            self.session.prev()
            self._refresh()

        def _refresh(self) -> None:
            path = self.session.current
            self._set_image(path)
            self.img_name_label.setText(path)
            self.progress_bar.setText(
                f"image {self.session.index + 1} of "
                f"{len(self.session.images)}"
            )
            self.csv_generated_message.setText("")
            self._refresh_buttons()

        def _refresh_buttons(self) -> None:
            assigned = self.session.assigned[self.session.current]
            for button in self.label_buttons:
                if button.text() in assigned:
                    button.setStyleSheet(GREEN_BUTTON_STYLE)
                else:
                    button.setStyleSheet("background-color: None")

        def _set_image(self, path: str) -> None:
            # scale-to-fit, preserving aspect ratio (main.py:571-591)
            pixmap = qt.QPixmap(path)
            margin = 20
            if pixmap.width() >= pixmap.height():
                pixmap = pixmap.scaledToWidth(self.IMG_PANEL - margin)
            else:
                pixmap = pixmap.scaledToHeight(self.IMG_PANEL - margin)
            self.image_box.setPixmap(pixmap)

        # ------------------------------------------------------------ output
        def generate_csv(self) -> None:
            self.session.write_csv(self.csv_out)
            message = f"csv saved to: {self.csv_out}"
            if self.generate_xlsx_checkbox.isChecked():
                try:
                    out = csv_to_xlsx(self.csv_out)
                    message += f" (+ {out.name})"
                except Exception:
                    print("Generating xlsx file failed.")
            self.csv_generated_message.setText(message)
            print(message)

        def closeEvent(self, event) -> None:  # noqa: N802 (Qt API name)
            # auto-save on close (main.py:657-663), once
            if not self._saved_on_close:
                self._saved_on_close = True
                self.generate_csv()
                if self.session.mode in ("copy", "move"):
                    n = self.session.apply_copy_move(self.output_folder)
                    print(
                        f"{self.session.mode}d {n} files into per-label "
                        f"folders under {self.output_folder}"
                    )

    return LabelerWindow


def make_setup_window(qt: SimpleNamespace) -> type:
    """Build the SetupWindow class against the injected toolkit `qt`.

    Counterpart of the reference's `SetupWindow` (main.py:40-296), closing
    the round-4 PARITY delta (the repo previously configured sessions via
    CLI args only). Same flow, step for step:
    1. Browse for the image folder (main.py:188-196);
    2. csv/copy/move radio buttons, csv default (main.py:150-185);
    3. labels from a one-per-line .txt file (main.py:198-217) OR a typed
       count + "Ok" generating numbered input fields (main.py:219-250);
    4. "Next" validates with the reference's error messages verbatim
       (main.py:262-279) and opens the LabelerWindow maximized with the
       collected (labels, folder, mode) (main.py:281-296).
    """

    class SetupWindow(qt.QWidget):
        def __init__(self, on_done=None) -> None:
            """`on_done(session)` is called with the configured
            AnnotationSession when the form validates; the default opens
            the LabelerWindow maximized like the reference."""
            super().__init__()
            self.on_done = on_done or self._open_labeler
            self.selected_folder = ""
            self.mode = "csv"
            self.label_inputs: list = []
            self.opened_labeler = None

            self.setWindowTitle(
                "imagegeneration_tpu - Annotation tool - Parameters setup"
            )
            self.setStyleSheet(load_stylesheet())
            self.headline_folder = qt.QLabel(
                "1. Select folder containing images you want to label", self
            )
            self.headline_folder.setObjectName("headline")
            self.headline_folder.move(60, 30)
            self.selected_folder_label = qt.QLabel(self)
            self.selected_folder_label.setObjectName("selectedFolderLabel")
            self.selected_folder_label.setGeometry(60, 60, 550, 26)
            self.browse_button = qt.QtWidgets.QPushButton("Browse", self)
            self.browse_button.setGeometry(611, 59, 80, 28)
            self.browse_button.clicked.connect(self.pick_new)

            self.mode_label = qt.QLabel("2. Select mode", self)
            self.mode_label.move(60, 115)
            self.radio_buttons = []
            for i, (mode, desc) in enumerate((
                ("csv", "csv file with assigned labels is generated"),
                ("copy", "labeled images are copied to per-label folders"),
                ("move", "labeled images are moved to per-label folders"),
            )):
                rb = qt.QRadioButton(f"{mode} ({desc})", self)
                rb.mode = mode
                rb.move(60, 150 + 30 * i)
                if mode == "csv":
                    rb.setChecked(True)
                rb.toggled.connect(self._mode_changed(rb))
                self.radio_buttons.append(rb)

            self.headline_labels = qt.QLabel("3. Specify labels", self)
            self.headline_labels.move(60, 260)
            self.browse_labels_button = qt.QtWidgets.QPushButton(
                "Select labels", self
            )
            self.browse_labels_button.setGeometry(520, 285, 89, 28)
            self.browse_labels_button.clicked.connect(self.pick_labels_file)
            self.num_labels_input = qt.QLineEdit(self)
            self.num_labels_input.setGeometry(75, 350, 60, 26)
            self.num_labels_input.setValidator(qt.QIntValidator())
            self.confirm_num_labels = qt.QtWidgets.QPushButton("Ok", self)
            self.confirm_num_labels.setGeometry(136, 349, 80, 28)
            self.confirm_num_labels.clicked.connect(self.generate_label_inputs)

            self.next_button = qt.QtWidgets.QPushButton("Next", self)
            self.next_button.setObjectName("primaryButton")
            self.next_button.move(360, 630)
            self.next_button.clicked.connect(self.continue_app)
            self.error_message = qt.QLabel(self)
            self.error_message.setObjectName("errorMessage")
            self.error_message.setGeometry(20, 810, 780, 20)
            self.error_message.setStyleSheet("color: red; font-weight: bold")

        def _mode_changed(self, rb):
            def handler(*_a):
                if rb.isChecked():
                    self.mode = rb.mode

            return handler

        def pick_new(self) -> None:
            folder = qt.QFileDialog().getExistingDirectory(
                None, "Select Folder"
            )
            if folder:
                self.selected_folder = folder
                self.selected_folder_label.setText(folder)

        def pick_labels_file(self) -> None:
            file_name, _ = qt.QFileDialog.getOpenFileName(
                self, "Select labels", "", "Text files (*.txt)"
            )
            if not file_name:
                return
            labels = [
                line.rstrip("\n")
                for line in Path(file_name).read_text().splitlines()
            ]
            labels = [l for l in labels if l.strip()]
            self.num_labels_input.setText(str(len(labels)))
            self.generate_label_inputs()
            for field, label in zip(self.label_inputs, labels):
                field.setText(label)

        def generate_label_inputs(self) -> None:
            text = self.num_labels_input.text().strip()
            if not text:
                return
            for field in self.label_inputs:
                field.deleteLater()
            self.label_inputs = []
            for i in range(int(text)):
                field = qt.QLineEdit(self)
                field.setGeometry(120, 400 + 30 * i, 200, 26)
                self.label_inputs.append(field)

        def check_validity(self) -> tuple[bool, str]:
            # The reference's exact messages (main.py:262-279).
            if self.selected_folder == "":
                return False, "Input folder has to be selected (step 1)"
            num = self.num_labels_input.text().strip()
            if num == "" or num == "0":
                return False, (
                    "Number of labels has to be number greater than 0 "
                    "(step 3)."
                )
            if len(self.label_inputs) == 0:
                return False, (
                    "You didn't provide any labels. Select number of labels "
                    'and press "Ok"'
                )
            for field in self.label_inputs:
                if field.text().strip() == "":
                    return False, "All label fields has to be filled (step 4)."
            return True, "Form ok"

        def continue_app(self) -> None:
            ok, message = self.check_validity()
            if not ok:
                self.error_message.setText(message)
                return
            labels = [f.text().strip() for f in self.label_inputs]
            session = AnnotationSession(
                self.selected_folder, labels, self.mode
            )
            self.close()
            self.on_done(session)

        def _open_labeler(self, session: AnnotationSession) -> None:
            window = make_labeler_window(qt)(session)
            window.showMaximized()
            self.opened_labeler = window  # keep a reference (Qt GC)

        def closeEvent(self, event) -> None:  # noqa: N802 (Qt API name)
            pass  # the setup form saves nothing

    return SetupWindow


def run_qt_gui(
    session: AnnotationSession,
    csv_out: str | Path | None = None,
    output_folder: str | Path | None = None,
) -> int:
    """Launch the PyQt5 labeler (blocks until the window closes)."""
    qt = load_pyqt5()
    app = qt.QApplication.instance() or qt.QApplication([])
    window = make_labeler_window(qt)(session, csv_out, output_folder)
    window.showMaximized()
    return app.exec_()


def run_qt_setup() -> int:
    """Launch the PyQt5 setup form; it opens the labeler on "Next"."""
    qt = load_pyqt5()
    app = qt.QApplication.instance() or qt.QApplication([])
    window = make_setup_window(qt)()
    window.showMaximized()
    return app.exec_()


# --------------------------------------------------------------------------
# tkinter fallback — stock-Python GUI for hosts without PyQt5 (this image).
# --------------------------------------------------------------------------


class TkLabelerWindow:
    """tkinter labeler with the same interaction model as the Qt window."""

    PANEL = 780

    def __init__(
        self,
        session: AnnotationSession,
        csv_out: str | Path | None = None,
        output_folder: str | Path | None = None,
        master=None,
    ) -> None:
        import tkinter as tk

        self.tk = tk
        self.session = session
        self.csv_out = Path(
            csv_out
            or Path(session.input_folder) / "output" / "assigned_classes.csv"
        )
        self.output_folder = Path(output_folder or session.input_folder)
        self.root = master or tk.Tk()
        self.root.title("imagegeneration_tpu - Annotation tool")
        self._photo = None  # keep a reference or tk garbage-collects it

        self.auto_next = tk.BooleanVar(value=False)
        self.make_xlsx = tk.BooleanVar(value=False)

        self.image_box = tk.Label(self.root)
        self.image_box.grid(row=2, column=0, rowspan=14, padx=8, pady=8)
        self.name_var = tk.StringVar()
        self.progress_var = tk.StringVar()
        self.message_var = tk.StringVar()
        tk.Label(self.root, textvariable=self.name_var).grid(
            row=0, column=0, sticky="w", padx=8
        )
        tk.Label(self.root, textvariable=self.progress_var).grid(
            row=1, column=0, sticky="w", padx=8
        )
        tk.Checkbutton(
            self.root,
            text="Automatically show next image when labeled",
            variable=self.auto_next,
        ).grid(row=0, column=1, columnspan=2, sticky="w")
        tk.Button(self.root, text="Prev", command=self.show_prev_image).grid(
            row=1, column=1
        )
        tk.Button(self.root, text="Next", command=self.show_next_image).grid(
            row=1, column=2
        )

        self.label_buttons = {}
        for i, label in enumerate(self.session.labels):
            btn = tk.Button(
                self.root,
                text=label,
                command=lambda x=label: self.toggle_label(x),
            )
            btn.grid(row=2 + i % 10, column=1 + i // 10, sticky="ew", padx=4)
            self.label_buttons[label] = btn
            if i < 9:
                self.root.bind(
                    str(i + 1), lambda _e, x=label: self.toggle_label(x)
                )
        tk.Checkbutton(
            self.root, text="Also generate .xlsx file", variable=self.make_xlsx
        ).grid(row=13, column=1, columnspan=2, sticky="w")
        tk.Button(
            self.root, text="Generate csv", command=self.generate_csv
        ).grid(row=14, column=1, columnspan=2)
        tk.Label(self.root, textvariable=self.message_var, fg="#43A047").grid(
            row=15, column=0, columnspan=3, sticky="w", padx=8
        )
        self.root.bind("n", lambda _e: self.show_next_image())
        self.root.bind("p", lambda _e: self.show_prev_image())
        self.root.protocol("WM_DELETE_WINDOW", self.on_close)
        self._refresh()

    def toggle_label(self, label: str) -> None:
        self.session.toggle_label(label)
        if self.auto_next.get():
            self.show_next_image()
        else:
            self._refresh_buttons()

    def show_next_image(self) -> None:
        self.session.next()
        self._refresh()

    def show_prev_image(self) -> None:
        self.session.prev()
        self._refresh()

    def _refresh(self) -> None:
        path = self.session.current
        self._set_image(path)
        self.name_var.set(path)
        self.progress_var.set(
            f"image {self.session.index + 1} of {len(self.session.images)}"
        )
        self.message_var.set("")
        self._refresh_buttons()

    def _refresh_buttons(self) -> None:
        assigned = self.session.assigned[self.session.current]
        for label, btn in self.label_buttons.items():
            if label in assigned:
                btn.configure(bg="#4CAF50", fg="white")
            else:
                btn.configure(bg="SystemButtonFace", fg="black")

    def _set_image(self, path: str) -> None:
        from PIL import Image, ImageTk

        img = Image.open(path)
        scale = min(self.PANEL / img.width, self.PANEL / img.height, 1.0)
        if scale < 1.0:
            img = img.resize(
                (int(img.width * scale), int(img.height * scale))
            )
        self._photo = ImageTk.PhotoImage(img, master=self.root)
        self.image_box.configure(image=self._photo)

    def generate_csv(self) -> None:
        self.session.write_csv(self.csv_out)
        message = f"csv saved to: {self.csv_out}"
        if self.make_xlsx.get():
            try:
                out = csv_to_xlsx(self.csv_out)
                message += f" (+ {out.name})"
            except Exception:
                print("Generating xlsx file failed.")
        self.message_var.set(message)
        print(message)

    def on_close(self) -> None:
        self.generate_csv()
        if self.session.mode in ("copy", "move"):
            n = self.session.apply_copy_move(self.output_folder)
            print(
                f"{self.session.mode}d {n} files into per-label folders "
                f"under {self.output_folder}"
            )
        self.root.destroy()


def run_tk_gui(
    session: AnnotationSession,
    csv_out: str | Path | None = None,
    output_folder: str | Path | None = None,
) -> None:
    """Launch the tkinter labeler (blocks until the window closes)."""
    window = TkLabelerWindow(session, csv_out, output_folder)
    window.root.mainloop()


class TkSetupWindow:
    """tkinter setup form with the reference SetupWindow's flow
    (folder browse, csv/copy/move mode, labels file or typed count ->
    numbered fields, validation, then the labeler)."""

    def __init__(self, master=None, on_done=None) -> None:
        import tkinter as tk

        self.tk = tk
        self.on_done = on_done or self._open_labeler
        self.root = master or tk.Tk()
        self.root.title("imagegeneration_tpu - Annotation setup")
        self.selected_folder = ""
        self.mode_var = tk.StringVar(value="csv")
        self.count_var = tk.StringVar()
        self.error_var = tk.StringVar()
        self.folder_var = tk.StringVar()
        self.label_fields: list = []

        tk.Label(
            self.root,
            text="1. Select folder containing images you want to label",
        ).grid(row=0, column=0, columnspan=2, sticky="w", padx=8)
        tk.Label(self.root, textvariable=self.folder_var).grid(
            row=1, column=0, sticky="w", padx=8
        )
        tk.Button(self.root, text="Browse", command=self.pick_new).grid(
            row=1, column=1
        )
        tk.Label(self.root, text="2. Select mode").grid(
            row=2, column=0, sticky="w", padx=8
        )
        for i, mode in enumerate(("csv", "copy", "move")):
            tk.Radiobutton(
                self.root, text=mode, variable=self.mode_var, value=mode
            ).grid(row=3 + i, column=0, sticky="w", padx=16)
        tk.Label(self.root, text="3. Specify labels").grid(
            row=6, column=0, sticky="w", padx=8
        )
        tk.Button(
            self.root, text="Select labels", command=self.pick_labels_file
        ).grid(row=6, column=1)
        tk.Entry(self.root, textvariable=self.count_var, width=6).grid(
            row=7, column=0, sticky="w", padx=16
        )
        tk.Button(
            self.root, text="Ok", command=self.generate_label_inputs
        ).grid(row=7, column=1, sticky="w")
        self._fields_row = 8
        tk.Button(self.root, text="Next", command=self.continue_app).grid(
            row=30, column=0, columnspan=2
        )
        tk.Label(self.root, textvariable=self.error_var, fg="red").grid(
            row=31, column=0, columnspan=2, sticky="w", padx=8
        )

    def pick_new(self) -> None:
        from tkinter import filedialog

        folder = filedialog.askdirectory(title="Select Folder")
        if folder:
            self.selected_folder = folder
            self.folder_var.set(folder)

    def pick_labels_file(self) -> None:
        from tkinter import filedialog

        name = filedialog.askopenfilename(
            title="Select labels", filetypes=[("Text files", "*.txt")]
        )
        if not name:
            return
        labels = [
            l for l in Path(name).read_text().splitlines() if l.strip()
        ]
        self.count_var.set(str(len(labels)))
        self.generate_label_inputs()
        for field, label in zip(self.label_fields, labels):
            field.delete(0, "end")
            field.insert(0, label)

    def generate_label_inputs(self) -> None:
        text = self.count_var.get().strip()
        if not text or not text.isdigit():
            return
        for field in self.label_fields:
            field.destroy()
        self.label_fields = []
        for i in range(int(text)):
            field = self.tk.Entry(self.root, width=24)
            field.grid(row=self._fields_row + i, column=0, columnspan=2,
                       sticky="w", padx=16)
            self.label_fields.append(field)

    def check_validity(self) -> tuple[bool, str]:
        if self.selected_folder == "":
            return False, "Input folder has to be selected (step 1)"
        num = self.count_var.get().strip()
        if num == "" or num == "0":
            return False, (
                "Number of labels has to be number greater than 0 (step 3)."
            )
        if not self.label_fields:
            return False, (
                "You didn't provide any labels. Select number of labels "
                'and press "Ok"'
            )
        for field in self.label_fields:
            if field.get().strip() == "":
                return False, "All label fields has to be filled (step 4)."
        return True, "Form ok"

    def continue_app(self) -> None:
        ok, message = self.check_validity()
        if not ok:
            self.error_var.set(message)
            return
        labels = [f.get().strip() for f in self.label_fields]
        session = AnnotationSession(
            self.selected_folder, labels, self.mode_var.get()
        )
        self.root.destroy()
        self.on_done(session)

    def _open_labeler(self, session: AnnotationSession) -> None:
        run_tk_gui(session)


def run_setup_gui() -> bool:
    """Launch the best available graphical SETUP form (reference
    main.py:40-296 flow) which then opens the labeler. Returns False when
    no GUI can start so the CLI can explain the args-based alternative."""
    try:
        run_qt_setup()
        return True
    except ImportError:
        pass
    if not (os.environ.get("DISPLAY") or os.name == "nt"):
        print("No display available ($DISPLAY unset); cannot open a GUI.")
        return False
    try:
        window = TkSetupWindow()
        window.root.mainloop()
        return True
    except Exception as e:  # tkinter missing or display rejected us
        print(f"tkinter GUI unavailable ({e}).")
        return False


def run_gui(
    session: AnnotationSession,
    csv_out: str | Path | None = None,
    output_folder: str | Path | None = None,
) -> bool:
    """Launch the best available GUI. Returns False if none can start
    (no toolkit or no display) so the caller can fall back to the
    terminal UI."""
    try:
        run_qt_gui(session, csv_out, output_folder)
        return True
    except ImportError:
        pass
    if not (os.environ.get("DISPLAY") or os.name == "nt"):
        print("No display available ($DISPLAY unset); cannot open a GUI.")
        return False
    try:
        run_tk_gui(session, csv_out, output_folder)
        return True
    except Exception as e:  # tkinter missing or display rejected us
        print(f"tkinter GUI unavailable ({e}).")
        return False
