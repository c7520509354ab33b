"""Raw-domain preprocessing (reference: rawimagesource.cc + helpers, SURVEY §2.2)."""
