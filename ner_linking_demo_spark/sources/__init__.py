"""Sources & sinks: pages readers, gazetteer readers, synthetic fixtures."""
