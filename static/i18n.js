/* Tiny i18n runtime: loads /static/i18n/<lang>.json, applies data-i18n /
   data-i18n-label attributes, persists the choice in localStorage. */
(function () {
  const DEFAULT = "en";
  let dict = {};

  function lang() {
    return localStorage.getItem("mapp_lang") || DEFAULT;
  }

  async function load(code) {
    try {
      const res = await fetch(`/static/i18n/${code}.json`);
      dict = res.ok ? await res.json() : {};
    } catch (e) {
      dict = {};
    }
    apply();
  }

  function t(key, fallback) {
    return dict[key] || fallback || key;
  }

  function apply() {
    document.querySelectorAll("[data-i18n]").forEach((el) => {
      el.innerHTML = t(el.dataset.i18n, el.innerHTML);
    });
    document.querySelectorAll("[data-i18n-label]").forEach((el) => {
      // label text node precedes the input; replace only the text portion
      const key = el.dataset.i18nLabel;
      for (const node of el.childNodes) {
        if (node.nodeType === Node.TEXT_NODE && node.textContent.trim()) {
          node.textContent = t(key, node.textContent.trim());
          return;
        }
      }
    });
  }

  window.i18n = { t, load, lang };
  document.addEventListener("DOMContentLoaded", () => {
    const sel = document.getElementById("lang-select");
    if (sel) {
      sel.value = lang();
      sel.addEventListener("change", () => {
        localStorage.setItem("mapp_lang", sel.value);
        load(sel.value);
      });
    }
    load(lang());
  });
})();
