"""Track-2 tooling: BMP codec, submission packager/validator, efficiency checker."""
