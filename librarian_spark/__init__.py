"""librarian_spark — PySpark-native engine with the capabilities of turbolytics/librarian."""

__version__ = "0.1.0"
