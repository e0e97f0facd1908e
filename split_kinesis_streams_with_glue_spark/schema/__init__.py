"""Schema machinery: envelope inference and Glue choice-type resolution."""
