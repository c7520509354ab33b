"""Lens correction stack (reference: SURVEY §2.7 — LCP, lensfun, EXIF).

Currently: Adobe LCP profiles (lens/lcp.py) feeding the geometric
transform and the raw vignette gain. Lensfun database matching and
makernote EXIF corrections route through external preconversion for now.
"""
