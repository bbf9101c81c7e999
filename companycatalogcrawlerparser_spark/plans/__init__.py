"""End-to-end plans: the crawl loop, catalog scrape, mailer read."""
