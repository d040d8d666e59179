"""`python -m speaker_recognition_tpu.gui` — launch the web GUI."""

from .server import main

main()
