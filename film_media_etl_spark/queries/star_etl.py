"""Star-schema ETL pipeline queries (dims + fact). Populated in the
star-ETL milestone."""
