"""Pure correctness kernel: no Ray imports allowed in this subpackage."""
