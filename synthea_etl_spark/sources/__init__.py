"""Sources: readers, schema registry, dirty-CSV repair."""
