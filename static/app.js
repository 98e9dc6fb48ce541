/* Mapperatorinator TPU web UI: form assembly, job lifecycle, SSE log
   streaming, cancellation, config persistence. Mirrors the reference's
   field contract (web-ui.py start_inference) over a stdlib-HTTP backend. */
(function () {
  const $ = (id) => document.getElementById(id);
  const form = $("inference-form");
  const log = $("log");
  const progress = $("progress");
  const generateBtn = $("generate-btn");
  const cancelBtn = $("cancel-btn");
  let jobId = null;
  let lastLogPath = null;
  let source = null;

  function flash(message, cls) {
    const box = $("flash-container");
    if (!box) return;
    const div = document.createElement("div");
    div.className = "flash " + (cls || "info");
    div.textContent = message;
    box.appendChild(div);
    setTimeout(() => div.remove(), 6000);
  }

  function configStatus(message, cls) {
    const el = $("config-status");
    if (!el) return;
    el.textContent = message;
    el.className = cls || "ok";
    setTimeout(() => { el.textContent = ""; }, 4000);
  }

  function applyConfig(saved) {
    for (const [k, v] of Object.entries(saved)) {
      const el = form.elements[k];
      if (!el || el instanceof RadioNodeList) continue;
      if (el.type === "checkbox") el.checked = !!v;
      else el.value = v;
    }
  }

  function append(line, cls) {
    const span = document.createElement("span");
    if (cls) span.className = cls;
    span.textContent = line + "\n";
    log.appendChild(span);
    log.scrollTop = log.scrollHeight;
    const m = /(\d{1,3})%/.exec(line);
    if (m) {
      progress.hidden = false;
      progress.value = Math.min(100, parseInt(m[1], 10));
    }
  }

  async function populateModels() {
    const res = await fetch("/models");
    const names = res.ok ? await res.json() : ["v32"];
    const sel = $("model-select");
    sel.innerHTML = "";
    for (const n of names) {
      const opt = document.createElement("option");
      opt.value = n;
      opt.textContent = n;
      sel.appendChild(opt);
    }
    if (names.includes("v32")) sel.value = "v32";
  }

  async function populateDescriptors() {
    const res = await fetch("/descriptors");
    if (!res.ok) return;
    const sets = await res.json();
    const groups = (sets.user_tags && sets.user_tags.groups.length
      ? sets.user_tags : (sets.omdb || { groups: [] })).groups;
    for (const id of ["descriptors", "negative_descriptors"]) {
      const sel = $(id);
      sel.innerHTML = "";
      for (const g of groups) {
        const og = document.createElement("optgroup");
        og.label = g.title;
        for (const item of g.items) {
          const opt = document.createElement("option");
          opt.value = item.value;
          opt.textContent = item.label;
          if (item.title) opt.title = item.title;
          og.appendChild(opt);
        }
        sel.appendChild(og);
      }
    }
  }

  function restoreConfig() {
    let saved = {};
    try { saved = JSON.parse(localStorage.getItem("mapp_config") || "{}"); } catch (e) {}
    applyConfig(saved);
  }

  function currentConfig() {
    const data = {};
    for (const el of form.elements) {
      if (!el.name) continue;
      if (el.type === "checkbox") data[el.name] = el.checked;
      else if (!el.multiple) data[el.name] = el.value;
    }
    return data;
  }

  function formData() {
    const fd = new FormData(form);
    return fd;
  }

  function persistConfig() {
    localStorage.setItem("mapp_config", JSON.stringify(currentConfig()));
  }

  function setRunning(running) {
    generateBtn.disabled = running;
    cancelBtn.disabled = !running;
  }

  function stream(id) {
    if (source) source.close();
    source = new EventSource(`/stream_output?job_id=${id}`);
    source.onmessage = (ev) => {
      if (ev.data === "__DONE__") {
        append(i18n.t("status.done", "Done."));
        source.close();
        setRunning(false);
        progress.value = 100;
      } else if (ev.data.startsWith("__ERROR__")) {
        append(i18n.t("status.error", "Error: ") + ev.data.slice(9), "err");
        source.close();
        setRunning(false);
      } else {
        append(ev.data);
      }
    };
    source.onerror = () => { source.close(); setRunning(false); };
  }

  form.addEventListener("submit", async (e) => {
    e.preventDefault();
    log.textContent = "";
    progress.hidden = true;
    persistConfig();
    setRunning(true);
    append(i18n.t("status.started", "Generation started..."));
    const res = await fetch("/start_inference", { method: "POST", body: new URLSearchParams(formData()) });
    const out = await res.json();
    if (out.status !== "success") {
      append(i18n.t("status.error", "Error: ") + (out.message || "unknown"), "err");
      setRunning(false);
      return;
    }
    jobId = out.job_id;
    lastLogPath = out.log_path || null;
    $("open-log-btn").disabled = !lastLogPath;
    stream(jobId);
  });

  cancelBtn.addEventListener("click", async () => {
    if (!jobId) return;
    const body = new FormData();
    body.append("job_id", jobId);
    await fetch("/cancel_inference", { method: "POST", body: new URLSearchParams(body) });
    append(i18n.t("status.cancelled", "Cancelled."));
    if (source) source.close();
    setRunning(false);
  });

  $("validate-paths").addEventListener("click", async () => {
    const body = new FormData();
    for (const k of ["audio_path", "output_path", "beatmap_path", "model_path"]) {
      const v = form.elements[k].value;
      if (v) body.append(k, v);
    }
    const res = await fetch("/validate_paths", { method: "POST", body: new URLSearchParams(body) });
    const out = await res.json();
    const missing = Object.entries(out).filter(([, ok]) => !ok).map(([k]) => k);
    const el = $("path-status");
    if (missing.length === 0) {
      el.textContent = i18n.t("status.paths_ok", "all paths exist");
      el.className = "ok";
    } else {
      el.textContent = i18n.t("status.paths_bad", "missing: ") + missing.join(", ");
      el.className = "err";
    }
  });

  $("save-config-btn").addEventListener("click", async () => {
    persistConfig();
    await fetch("/save_config", { method: "POST", body: new URLSearchParams(formData()) });
    configStatus(i18n.t("status.config_saved", "config saved"));
  });

  // config portability (reference: export-config-btn / import-config-input /
  // reset-config-btn, static/app.js)
  $("export-config-btn").addEventListener("click", () => {
    const blob = new Blob([JSON.stringify(currentConfig(), null, 2)],
                          { type: "application/json" });
    const a = document.createElement("a");
    a.href = URL.createObjectURL(blob);
    a.download = "mapperatorinator_config.json";
    a.click();
    URL.revokeObjectURL(a.href);
    configStatus(i18n.t("status.config_exported", "config exported"));
  });

  $("import-config-btn").addEventListener("click", () => $("import-config-input").click());
  $("import-config-input").addEventListener("change", async (ev) => {
    const file = ev.target.files[0];
    if (!file) return;
    try {
      applyConfig(JSON.parse(await file.text()));
      persistConfig();
      configStatus(i18n.t("status.config_imported", "config imported"));
    } catch (e) {
      configStatus(i18n.t("status.config_invalid", "invalid config file"), "err");
      flash(String(e), "err");
    }
    ev.target.value = "";
  });

  $("reset-config-btn").addEventListener("click", () => {
    localStorage.removeItem("mapp_config");
    form.reset();
    $("gamemode").dispatchEvent(new Event("change"));
    configStatus(i18n.t("status.config_reset", "config reset"));
  });

  $("open-log-btn").addEventListener("click", async () => {
    if (!lastLogPath) return;
    const body = new FormData();
    body.append("path", lastLogPath);
    const res = await fetch("/open_log_file", { method: "POST", body: new URLSearchParams(body) });
    const out = await res.json();
    if (out.status !== "success") flash(out.message || "could not open log", "err");
  });

  $("open-folder-btn").addEventListener("click", async () => {
    const body = new FormData();
    body.append("path", form.elements.output_path.value);
    await fetch("/open_folder", { method: "POST", body: new URLSearchParams(body) });
  });

  // gamemode-dependent field visibility
  $("gamemode").addEventListener("change", () => {
    const gm = $("gamemode").value;
    $("mania-settings").style.display = (gm === "3" || gm === "1") ? "" : "none";
  });

  populateModels();
  populateDescriptors();
  restoreConfig();
  $("gamemode").dispatchEvent(new Event("change"));
})();
